package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time-correct training-example assembly from an event log —
  * the feature-store discipline (public knowledge: every feature platform
  * documents it): for each ANCHOR event, features may only aggregate
  * strictly-earlier outcome events inside a trailing window, and the
  * label may only look at strictly-later outcomes inside a forward
  * horizon. Getting either boundary wrong leaks the future into training
  * ([[graft.ops.Joins]]' as-of join is the point-lookup half; this is the
  * windowed-aggregate half).
  *
  * Mechanics: one unified pass — anchors and outcomes stay ONE stream,
  * and both the trailing-feature frame and the forward-label frame are
  * RANGE window frames over the same (user, event-time-ms) sort, so the
  * whole assembly costs ONE exchange on the entity key and one ordered
  * window pass per entity. Same-millisecond outcomes are excluded from
  * BOTH frames (`[-w, -1]` and `[+1, +h]` in ms): an outcome simultaneous
  * with the anchor is neither safely "past" nor a caused "future".
  *
  * 100 TB shape: the exchange is entity-keyed (the natural key of a
  * feature store); a pathological mega-entity would serialize its own
  * window — `chunkMs > 0` engages the exact time-chunked mitigation
  * (partition each entity's timeline into chunks with halo replication,
  * so one entity's window spreads across tasks — see
  * [[rollingExamples]]). Aggregate VALUE columns should be
  * integer-shaped by the caller (e.g. `floor(value·100)` cents) so
  * frame-order float accumulation can never smear the last ulp — the
  * repo's usual exactness discipline.
  */
object Features {

  /** Assemble `(carry…, n_outcomes_past, value_past, converted)` rows,
    * one per anchor event.
    *
    * @param anchorCond   rows that become training examples
    * @param outcomeCond  rows whose presence/value is aggregated
    * @param valueCol     integer-shaped outcome value to sum over the
    *                     trailing window (evaluated on outcome rows only)
    * @param featureWindowMs trailing feature window `[t-w, t)` in ms
    * @param labelWindowMs   forward label horizon `(t, t+h]` in ms
    * @param carry        anchor columns to keep (ids, entity, …)
    * @param chunkMs      0 (default) = one window partition per entity;
    *                     > 0 = the EXACT mega-entity mitigation: each
    *                     entity's timeline splits into `chunkMs`-wide
    *                     chunks and the window partitions by
    *                     (entity, chunk), so a pathological entity's
    *                     ordered pass spreads across ~span/chunkMs tasks
    *                     instead of serializing in one. Rows near a chunk
    *                     boundary replicate into the neighbor chunk as
    *                     HALO (history for the next chunk's anchors,
    *                     future for the previous chunk's) — ≤ 2 extra
    *                     copies per row, bounded by requiring
    *                     `chunkMs ≥ max(featureWindowMs, labelWindowMs)`
    *                     so no frame can span more than one boundary.
    *                     Anchors emit only from their HOME chunk, so the
    *                     output is row-for-row identical to the unchunked
    *                     form (FeaturesSpec pins the parity).
    *                     SIZE chunkMs SEVERAL× the windows: halo overhead
    *                     is ~(feature+label)/chunk extra copies per row,
    *                     so chunk == window duplicates ~2× and eats the
    *                     parallel win (SCALE_r13 §3 measures 1.2× there
    *                     vs 3.3× at chunk = 7×window); parallelism caps
    *                     at span/chunk. The unchunked hazard it removes
    *                     is SUPER-linear: a spilled window partition pays
    *                     Spark's spill-array re-iteration per frame
    *                     slide (measured n² growth, 300k→900k rows =
    *                     47 s→459 s in one task; the onset knob is
    *                     `spark.sql.windowExec.buffer.spill.threshold` —
    *                     raising it buys headroom at task-memory cost,
    *                     chunking removes the term instead of moving it).
    */
  def rollingExamples(
      events: DataFrame,
      entityCol: String,
      tsCol: String,
      anchorCond: Column,
      outcomeCond: Column,
      valueCol: Column,
      featureWindowMs: Long,
      labelWindowMs: Long,
      carry: Seq[String],
      chunkMs: Long = 0L): DataFrame = {
    require(featureWindowMs > 0, s"featureWindowMs must be positive, got $featureWindowMs")
    require(labelWindowMs > 0, s"labelWindowMs must be positive, got $labelWindowMs")
    require(chunkMs == 0 || chunkMs >= math.max(featureWindowMs, labelWindowMs),
      s"chunkMs=$chunkMs must be >= both windows so a frame spans at most one boundary")
    val entity = col(s"`$entityCol`")
    // epoch ms exactly as the oracle's epoch_ms(): micros floor-div 1000
    // (the repo's proven cross-engine convention — see join_range)
    val raw = events.select(
      (entity +: expr(s"unix_micros(`$tsCol`) div 1000L").as("_t") +:
        anchorCond.as("_a") +: outcomeCond.as("_o") +:
        valueCol.cast("long").as("_v") +: carry.map(c => col(s"`$c`"))): _*)
    val (base, partKeys) =
      if (chunkMs == 0) (raw, Seq(entity))
      else {
        // Exact floor division on longs via the non-negative pmod — `div`
        // truncates toward zero and floor-via-double loses exactness past
        // 2^52; epoch ms can be either side of zero in tests.
        def floorDiv(t: Column): Column =
          ((t - pmod(t, lit(chunkMs))) / lit(chunkMs)).cast("long")
        val home = floorDiv(col("_t"))
        // Halo replication: a row also serves chunk home+1 when it can be
        // HISTORY for an anchor there (within featureWindowMs of the
        // boundary), and chunk home-1 when it can be FUTURE for an anchor
        // there (within labelWindowMs past the boundary).
        val probes = filter(array(
          home,
          when(col("_t") >= (home + 1) * chunkMs - featureWindowMs, home + 1),
          when(col("_t") < home * chunkMs + labelWindowMs, home - 1)),
          x => x.isNotNull)
        (raw.withColumn("_chunk", explode(probes)), Seq(entity, col("_chunk")))
      }
    val order = Window.partitionBy(partKeys: _*).orderBy(col("_t"))
    val past = order.rangeBetween(-featureWindowMs, -1)
    val future = order.rangeBetween(1, labelWindowMs)
    val homeOnly =
      if (chunkMs == 0) lit(true)
      else col("_chunk") ===
        ((col("_t") - pmod(col("_t"), lit(chunkMs))) / lit(chunkMs)).cast("long")
    base
      .withColumn("n_outcomes_past",
        coalesce(sum(when(col("_o"), 1L).otherwise(0L)).over(past), lit(0L)))
      .withColumn("value_past",
        coalesce(sum(when(col("_o"), col("_v"))).over(past), lit(0L)))
      .withColumn("converted",
        coalesce(sum(when(col("_o"), 1L).otherwise(0L)).over(future), lit(0L)) > 0)
      .where(col("_a") && homeOnly)
      .select((carry.map(c => col(s"`$c`")) :+ entity :+
        col("n_outcomes_past") :+ col("value_past") :+ col("converted")): _*)
  }
}
