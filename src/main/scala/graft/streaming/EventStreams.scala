package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
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

  /** Stateful sessionization over a live stream, keyed by user: incoming
    * events fold into gap-separated sessions; sessions closed by an in-batch
    * gap emit immediately, and the open session is KEPT in state
    * (`state.update`) with an event-time timeout at `end + gap` — it emits
    * when the watermark passes that point. Sessions spanning micro-batches
    * therefore stay whole, and idle sessions flush via the timeout.
    *
    * Streaming-only semantics: batch execution never fires timeouts, so the
    * trailing open session per user would be withheld — use
    * [[sessionizeBatch]] for batch/backfill (identical sessions, one shuffle
    * plus a per-user window scan, no per-group state).
    *
    * @param watermark event-time watermark applied when `events` is a stream
    *                  (required by the event-time timeout).
    */
  def sessionize(
      events: Dataset[Event],
      gapMs: Long = 30 * 60 * 1000L,
      watermark: String = "10 minutes"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val src = if (events.isStreaming) events.withWatermark("ts", watermark) else events
    src
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          def emit(s: SessionState): Session =
            Session(userId, new java.sql.Timestamp(s.start),
              new java.sql.Timestamp(s.end), s.nEvents, s.totalValue)
          if (state.hasTimedOut) {
            val closed = emit(state.get)
            state.remove()
            Iterator.single(closed)
          } else {
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
                  sessions += emit(s)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end + gapMs)
            }
            sessions.iterator
          }
      }
  }

  /** Per-user event buffer for [[streamingExamples]]: `(tMs, eventId,
    * isAnchor, isOutcome, valueCents)` tuples, kept sorted by (t, id).
    */
  final case class ExampleState(
      events: List[(Long, Long, Boolean, Boolean, Long)])

  final case class TrainingExample(user_id: Long, event_id: Long,
      n_outcomes_past: Long, value_past: Long, converted: Boolean)

  /** STREAMING point-in-time example assembly — the live twin of
    * [[graft.ops.Features.rollingExamples]] (identical examples, proven in
    * spec): an anchor's features are fully determined at its own event
    * time, but its LABEL needs the forward horizon — so each example
    * emits exactly when the event-time watermark passes `t + label`
    * (the horizon has closed; any outcome later than the watermark
    * allowance is missed by both this and any offline system that cuts
    * at the same lateness bound). Per-user state holds only the event
    * window that can still matter: tuples older than
    * `watermark − label − feature` serve no pending or future anchor
    * (future anchors arrive above the watermark) and are evicted every
    * invocation, so state is bounded by per-user event RATE × (feature +
    * label) span, never by stream history. Wake-ups ride event-time
    * timeouts at the next pending anchor's close (or the eviction horizon
    * when no anchor is pending), exactly [[sessionize]]'s discipline.
    *
    * Streaming-only semantics (the [[sessionize]] caveat): batch execution
    * never advances a watermark, so no horizon ever closes — use
    * [[graft.ops.Features.rollingExamples]] for batch/backfill.
    */
  def streamingExamples(
      events: Dataset[Event],
      anchorType: String,
      outcomeType: String,
      featureWindowMs: Long,
      labelWindowMs: Long,
      watermark: String = "10 minutes"): Dataset[TrainingExample] = {
    val spark = events.sparkSession
    import spark.implicits._
    val src = if (events.isStreaming) events.withWatermark("ts", watermark) else events
    src
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[ExampleState, TrainingExample](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[ExampleState]) =>
          val wm = state.getCurrentWatermarkMs()
          val incoming = it.map { e =>
            (e.ts.getTime, e.event_id, e.event_type == anchorType,
              e.event_type == outcomeType, math.floor(e.value * 100).toLong)
          }.toList
          val buffer = ((state.getOption.map(_.events).getOrElse(Nil) ++ incoming)
            .distinct).sortBy(t => (t._1, t._2))
          // emit every anchor whose label horizon closed under the watermark
          val (closeable, pending) = buffer.partition {
            case (t, _, isA, _, _) => isA && t + labelWindowMs <= wm
          }
          val out = closeable.map { case (t, id, _, _, _) =>
            val past = buffer.filter { case (te, _, _, isO, _) =>
              isO && te >= t - featureWindowMs && te <= t - 1 }
            val future = buffer.exists { case (te, _, _, isO, _) =>
              isO && te >= t + 1 && te <= t + labelWindowMs }
            TrainingExample(userId, id, past.size.toLong, past.map(_._5).sum, future)
          }
          // evict tuples that can serve no pending or future anchor — but
          // an emitted anchor that is ALSO an outcome (anchorType ==
          // outcomeType, e.g. "every purchase is an example AND counts in
          // later purchases' windows") must stay serveable until the
          // eviction horizon passes it: keep it with the anchor flag
          // dropped so it never re-emits, matching the batch twin where
          // every row is visible to every window
          val emittedOutcomes = closeable.collect {
            case (t, id, _, true, v)
                if t >= wm - labelWindowMs - featureWindowMs =>
              (t, id, false, true, v)
          }
          val keep = pending.filter { case (t, _, isA, _, _) =>
            isA || t >= wm - labelWindowMs - featureWindowMs } ++ emittedOutcomes
          if (keep.isEmpty) state.remove()
          else {
            state.update(ExampleState(keep))
            val nextClose = keep.collect { case (t, _, true, _, _) => t + labelWindowMs }
            val wake = if (nextClose.nonEmpty) nextClose.min
              else wm + labelWindowMs + featureWindowMs + 1
            state.setTimeoutTimestamp(math.max(wake, wm + 1))
          }
          out.iterator
      }
  }

  /** Streaming exact dedup: drops rows whose `keyCols` were already seen,
    * with state bounded by the watermark (`dropDuplicatesWithinWatermark`:
    * a duplicate arriving within the watermark delay of the original is
    * guaranteed dropped; state for older keys is reclaimed — the only
    * dedup that runs forever on an unbounded stream without unbounded
    * state). Batch inputs fall back to plain `dropDuplicates`.
    */
  def streamingDedup(
      events: DataFrame,
      keyCols: Seq[String],
      tsCol: String = "ts",
      watermark: String = "10 minutes"): DataFrame =
    if (events.isStreaming)
      events.withWatermark(tsCol, watermark).dropDuplicatesWithinWatermark(keyCols)
    else events.dropDuplicates(keyCols)

  /** Streaming CORPUS dedup — the live half of
    * [[graft.ops.Dedup.exactIncremental]]'s daily-ingest contract.
    * [[streamingDedup]]'s watermark bounds state by TIME, which is right
    * for event keys and wrong for a training corpus: "already accepted" is
    * forever. Here the state IS the accepted table: each micro-batch
    * left-anti joins the store's fingerprint column (one BIGINT per
    * accepted doc, read from the accepted table itself — no second sink,
    * no dual-write atomicity problem), min-keeps within itself, and lands
    * in `acceptedPath/_batch=<id>` carrying its `fp` column. Batch-id
    * partition overwrite (dynamic mode) makes replays IDEMPOTENT: a
    * recovered batch rewrites its own partition and nothing else, and
    * re-judges itself against exactly the earlier batches' fingerprints
    * (its own partition's fps are rewritten, not double-counted).
    */
  def dedupToCorpus(
      docs: DataFrame,
      textCol: String,
      tieBreaker: String,
      acceptedPath: String,
      checkpointDir: String,
      bloomNumBits: Long = 0,
      bloomExpectedItems: Long = 1000000): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val spark = batch.sparkSession
        val bloomPath = acceptedPath + "_bloom"
        val store =
          try
            spark.read.parquet(acceptedPath)
              .where(col("_batch") =!= id) // replay: ignore own partition
              .select(col("fp")).distinct()
          catch {
            // first batch: no accepted table yet
            case _: org.apache.spark.sql.AnalysisException =>
              spark.range(0).select(col("id").as("fp"))
          }
        // `bloomNumBits > 0` maintains mergeable per-batch Bloom states
        // next to the store and pre-filters each batch
        // ([[graft.ops.Dedup.exactIncrementalBloom]]): definitely-new rows
        // never probe the store's terabytes — the shape that holds when
        // the accepted corpus dwarfs every batch. Replays are safe without
        // epoch bookkeeping: re-appending a batch's state is a bitwise OR
        // with itself. A replayed batch's own prior fps ARE in its state
        // (unlike the partition-excluded store) — they fall in the
        // maybe-seen set, and the anti-join against the own-partition-
        // excluded store re-accepts them: same rows, same idempotence.
        val bloomStates =
          if (bloomNumBits <= 0) None
          else
            try {
              val st = spark.read.parquet(bloomPath)
              if (st.isEmpty) None else Some(st)
            } catch {
              case _: org.apache.spark.sql.AnalysisException => None
            }
        val accepted = bloomStates match {
          case Some(states) =>
            graft.ops.Dedup.exactIncrementalBloom(batch, textCol, tieBreaker, store, states)
          case None =>
            graft.ops.Dedup.exactIncremental(batch, textCol, tieBreaker, store)
        }
        val acceptedFp = accepted
          .withColumn("fp", graft.ops.TextAnalysis.contentFingerprint(col(s"`$textCol`")))
        acceptedFp
          .withColumn("_batch", lit(id))
          .write.mode("overwrite")
          // writer-scoped, NOT spark.conf.set: mutating the session conf
          // would silently change overwrite semantics for every other
          // writer sharing the session
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("_batch").parquet(acceptedPath)
        if (bloomNumBits > 0)
          graft.ops.Dedup.fingerprintBloomState(
              acceptedFp.select(col("fp")).where(col("fp").isNotNull).distinct(),
              bloomExpectedItems, bloomNumBits)
            .write.mode("append").parquet(bloomPath)
      }
      .start()

  /** Compact the accepted-corpus store [[dedupToCorpus]] maintains: a
    * long-running stream leaves one `_batch=<id>` partition per micro-batch
    * — the classic streaming small-files problem — and this folds every
    * partition into the sentinel `_batch=-1` via the same staged swap as
    * [[compactIncrements]] (pause the writer or run from the cadence that
    * owns the table). Replay semantics survive compaction: a replayed batch
    * excludes only its OWN partition, the sentinel stays visible, so the
    * replay re-drops its rows against them and writes an empty partition —
    * the accepted set never changes. Bloom states are untouched (their
    * merge is already one row per batch and OR-idempotent).
    */
  def compactAcceptedCorpus(
      spark: org.apache.spark.sql.SparkSession,
      acceptedPath: String): Unit = {
    // No cache: unlike [[compactIncrements]]' kilobyte table this is the
    // corpus. The staged write reads the source directory and completes
    // fully before promote touches it, so the rewrite streams through —
    // one scan, one write, constant memory.
    val staged = acceptedPath + ".compacting"
    spark.read.parquet(acceptedPath)
      .withColumn("_batch", lit(-1L))
      .write.mode("overwrite").partitionBy("_batch").parquet(staged)
    val fs = graft.store.FsOps.fileSystem(spark, staged)
    graft.store.FsOps.promote(fs,
      new org.apache.hadoop.fs.Path(staged),
      new org.apache.hadoop.fs.Path(acceptedPath))
  }

  /** Streaming sink into the at-rest search index: every micro-batch is
    * appended to a parquet table with its analyzed `_split` companions
    * precomputed (see [[graft.store.SearchIndex]]) — the live-ingestion
    * counterpart of the reference's bulk `saveToEs`
    * (`notebooks/lib/esindex.py:116-139`), minus the second cluster.
    * `foreachBatch` reuses the batch writer, so layout and companions are
    * identical between backfill and live ingestion.
    */
  def writeToSearchIndex(
      events: DataFrame,
      path: String,
      analyzeColumns: Seq[String],
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.store.SearchIndex.withAnalyzedColumns(batch, analyzeColumns)
          .write.mode("append").parquet(path)
      }
      .start()

  /** Streaming dictionary maintenance — the live half of
    * [[graft.dict.Dictionary.profileIncrement]]'s 100 TB update story: keep
    * the data dictionary current while a stream ingests, without ever
    * re-profiling the corpus.
    *
    * Each micro-batch is profiled into one MERGEABLE increment (counts and
    * moments as sums, min/max under the field's ordering, distincts as HLL
    * sketches) and appended to a tiny at-rest increment table — per batch
    * that's one row per column, kilobytes, regardless of batch size. The
    * current dictionary is [[dictionaryFromIncrements]]: merge + finalize
    * over the accumulated increments, cost proportional to
    * batches × columns, never to rows. Compaction, when the batch count
    * grows, is the same merge written back as one increment — it can run
    * any time, because merging is associative and commutative.
    */
  def maintainDictionary(
      events: DataFrame,
      incrementPath: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        // foreachBatch is at-least-once: a failure after the append but
        // before the checkpoint commit replays the batch and appends again.
        // Stamping the epoch makes the table idempotent to READ — consumers
        // keep one increment per (column, batch) — without needing an
        // atomic-commit sink.
        graft.dict.Dictionary.profileIncrement(batch)
          .withColumn("inc_batch_id", org.apache.spark.sql.functions.lit(batchId))
          .write.mode("append").parquet(incrementPath)
      }
      .start()

  /** One increment row per (column, batch), dropping at-least-once replays;
    * tables without the epoch column (plain batch writers) pass through.
    */
  private def dedupedIncrements(df: DataFrame): DataFrame =
    if (!df.columns.contains("inc_batch_id")) df
    else df.dropDuplicates("dict_field", "inc_batch_id").drop("inc_batch_id")

  /** The current dictionary implied by an increment table maintained by
    * [[maintainDictionary]] (or any batch writer of
    * [[graft.dict.Dictionary.profileIncrement]] rows).
    */
  def dictionaryFromIncrements(
      spark: org.apache.spark.sql.SparkSession,
      incrementPath: String): DataFrame =
    graft.dict.Dictionary.finalizeIncrement(
      graft.dict.Dictionary.mergeIncrements(
        dedupedIncrements(spark.read.parquet(incrementPath))))

  /** Live corpus-vocabulary maintenance — the frequent-items analogue of
    * [[maintainDictionary]]: append one `approx_top_k` sketch state per
    * micro-batch (kilobytes, bounded by `maxTracked`), stamped with the
    * epoch for the same at-least-once replay idempotence. The current
    * vocabulary is [[vocabularyFromStates]] — combine states, estimate —
    * and never re-scans ingested text.
    */
  def maintainVocabulary(
      docs: DataFrame,
      textCol: String,
      statePath: String,
      checkpointDir: String,
      maxTracked: Int = 4096): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.ops.TextAnalysis.vocabState(batch, textCol, maxTracked)
          .withColumn("state_batch_id", org.apache.spark.sql.functions.lit(batchId))
          .write.mode("append").parquet(statePath)
      }
      .start()

  /** The current top-`k` vocabulary implied by a state table maintained by
    * [[maintainVocabulary]]: drop replayed epochs, combine, estimate.
    * Exact while distinct terms stay under `maxTracked` (the same contract
    * the batch-side `vocab_topk_incremental` oracle pins).
    */
  def vocabularyFromStates(
      spark: org.apache.spark.sql.SparkSession,
      statePath: String,
      k: Int,
      maxTracked: Int = 4096): DataFrame = {
    import org.apache.spark.sql.functions.col
    val states = spark.read.parquet(statePath)
      .dropDuplicates("state_batch_id")
      .select("_state")
      .where(col("_state").isNotNull) // empty micro-batches accumulate null
    graft.ops.TextAnalysis.vocabMerge(Seq(states), k, maxTracked)
  }

  /** Live serving-rollup maintenance — the ingest half of
    * [[graft.query.PreAgg]]'s 100 TB serving story: the dashboard's rollup
    * table cannot be rebuilt by re-scanning the corpus on every arrival, so
    * each micro-batch is rolled up into one MERGEABLE increment (counts per
    * distinct dimension combination — [[graft.query.PreAgg.increment]], the
    * same contract as the dictionary's HLL/KLL and the vocabulary's
    * `approx_top_k` states) and appended at rest, epoch-stamped for
    * at-least-once replay idempotence. The current rollup is
    * [[rollupFromIncrements]]: drop replayed epochs, group-sum — cost
    * proportional to accumulated increment rows, never to ingested corpus
    * rows. [[compactRollupIncrements]] bounds the table at |distinct
    * combos| rows on whatever cadence owns it.
    */
  def maintainRollup(
      events: DataFrame,
      dims: Seq[(String, Column)],
      incrementPath: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.query.PreAgg.increment(batch, dims)
          .withColumn("inc_batch_id", lit(batchId))
          .write.mode("append").parquet(incrementPath)
      }
      .start()

  /** The current serving rollup implied by an increment table maintained by
    * [[maintainRollup]]: one increment row per (dimension combo, batch) —
    * a foreachBatch retry re-appends a whole epoch, and each epoch's rollup
    * carries a combo at most once, so the per-combo epoch dedup drops
    * exactly the replays — then merge (group-sum). The result feeds
    * [[graft.query.PreAgg]]'s weighted serving twins unchanged.
    */
  def rollupFromIncrements(
      spark: org.apache.spark.sql.SparkSession,
      incrementPath: String): DataFrame = {
    val inc = spark.read.parquet(incrementPath)
    val dims = inc.columns.filter(c => c != graft.query.PreAgg.CntCol && c != "inc_batch_id")
    graft.query.PreAgg.merge(
      inc.dropDuplicates(dims :+ "inc_batch_id").drop("inc_batch_id"))
  }

  /** [[maintainRollup]] for the EXTREMES rollup flavor
    * ([[graft.query.PreAgg.incrementWithExtremes]]): per-batch min/max
    * measures beside the count. Replay dedup is per (dim combo, epoch)
    * like the count rollup — though the extreme measures would survive a
    * replay even unguarded (min/max are idempotent), the count would
    * not, so the same discipline applies.
    */
  def maintainExtremesRollup(
      events: DataFrame,
      dims: Seq[(String, Column)],
      mins: Seq[(String, Column)],
      maxs: Seq[(String, Column)],
      incrementPath: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.query.PreAgg.incrementWithExtremes(batch, dims, mins, maxs)
          .withColumn("inc_batch_id", lit(batchId))
          .write.mode("append").parquet(incrementPath)
      }
      .start()

  /** The serving extremes rollup implied by [[maintainExtremesRollup]]'s
    * increments — per-combo epoch dedup, then [[graft.query.PreAgg
    * .mergeExtremes]].
    */
  def extremesRollupFromIncrements(
      spark: org.apache.spark.sql.SparkSession,
      incrementPath: String): DataFrame = {
    val inc = spark.read.parquet(incrementPath)
    val dims = inc.columns.filter(c => c != graft.query.PreAgg.CntCol &&
      c != "inc_batch_id" && !c.endsWith("_min") && !c.endsWith("_max"))
    graft.query.PreAgg.mergeExtremes(
      inc.dropDuplicates(dims :+ "inc_batch_id").drop("inc_batch_id"))
  }

  /** [[maintainRollup]] for the SUM-MEASURE rollup flavor
    * ([[graft.query.PreAgg.incrementWithSums]]): exact LONG sum measures
    * beside the count — the moments layer behind the weighted_avg /
    * geo_centroid / matrix_stats / string_stats serves. Unlike the
    * extremes, a replayed epoch WOULD inflate a sum, so the per-(combo,
    * epoch) dedup in [[sumRollupFromIncrements]] is load-bearing for
    * every measure here, not just the count.
    */
  def maintainSumRollup(
      events: DataFrame,
      dims: Seq[(String, Column)],
      sums: Seq[(String, Column)],
      incrementPath: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.query.PreAgg.incrementWithSums(batch, dims, sums)
          .withColumn("inc_batch_id", lit(batchId))
          .write.mode("append").parquet(incrementPath)
      }
      .start()

  /** The serving sum-measure rollup implied by [[maintainSumRollup]]'s
    * increments — per-combo epoch dedup (exactly the replays, see
    * [[rollupFromIncrements]]), then [[graft.query.PreAgg.mergeSums]].
    */
  def sumRollupFromIncrements(
      spark: org.apache.spark.sql.SparkSession,
      incrementPath: String): DataFrame = {
    val inc = spark.read.parquet(incrementPath)
    val dims = inc.columns.filter(c => c != graft.query.PreAgg.CntCol &&
      c != "inc_batch_id" && !c.endsWith(graft.query.PreAgg.SumSuffix))
    graft.query.PreAgg.mergeSums(
      inc.dropDuplicates(dims :+ "inc_batch_id").drop("inc_batch_id"))
  }

  /** Maintain the boilerplate gram-df statistics from a DOCUMENT stream —
    * the corpus-fraction threshold needs corpus-wide document frequencies,
    * which are sum-mergeable: each batch appends `(gram, df)` counts plus
    * one null-gram row carrying the batch's document count (grams are
    * xxhash64 values and never null, so the sentinel is unambiguous and
    * the table stays single-schema). Same replay contract as
    * [[maintainRollup]]: per-batch epochs dedup retried appends.
    *
    * Serving: [[gramDfFromIncrements]] → [[graft.ops.TextAnalysis
    * .boilerplateFrequent]] → [[graft.ops.TextAnalysis
    * .boilerplateProfileAgainst]] scores incoming documents against the
    * corpus-so-far Zipf head without re-reading any corpus text.
    */
  def maintainGramDf(
      docs: DataFrame,
      textCol: String,
      n: Int,
      incrementPath: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val dfs = batch
          .select(explode(graft.expr.TextShingles.shingleHashes(
            col(s"`$textCol`"), n)).as("gram"))
          .groupBy("gram").agg(count(lit(1)).as("df"))
        val total = batch.agg(count(lit(1)).as("df"))
          .select(lit(null).cast("long").as("gram"), col("df"))
        dfs.unionByName(total)
          .withColumn("inc_batch_id", lit(batchId))
          .write.mode("append").parquet(incrementPath)
      }
      .start()

  /** The corpus-so-far gram-df table implied by [[maintainGramDf]]'s
    * increments: replay-deduped per (gram, epoch), then sum-merged —
    * `(gram, df)` plus the null-gram total-documents row,
    * [[graft.ops.TextAnalysis.boilerplateFrequent]]'s input shape.
    */
  def gramDfFromIncrements(
      spark: org.apache.spark.sql.SparkSession,
      incrementPath: String): DataFrame =
    spark.read.parquet(incrementPath)
      .dropDuplicates(Seq("gram", "inc_batch_id"))
      .groupBy("gram").agg(sum(col("df")).as("df"))

  /** Compact a gram-df increment table to one row per gram (plus the
    * null-gram document-count sentinel) via the same staged swap as
    * [[compactRollupIncrements]]. Without this the table grows one row per
    * (gram, batch) forever and [[gramDfFromIncrements]] re-aggregates the
    * full history on every serve — gram cardinality makes that much heavier
    * than the rollup case, so the compaction cadence matters MORE here.
    * The compacted rows wear the sentinel epoch so replay dedup stays armed
    * for subsequent appends.
    */
  def compactGramDfIncrements(
      spark: org.apache.spark.sql.SparkSession,
      incrementPath: String): Unit = {
    val merged = gramDfFromIncrements(spark, incrementPath)
      .withColumn("inc_batch_id", lit(-1L))
      .coalesce(1)
      .cache()
    try {
      merged.count() // materialize BEFORE touching the directory being read
      val staged = incrementPath + ".compacting"
      merged.write.mode("overwrite").parquet(staged)
      val fs = graft.store.FsOps.fileSystem(spark, staged)
      graft.store.FsOps.promote(fs,
        new org.apache.hadoop.fs.Path(staged),
        new org.apache.hadoop.fs.Path(incrementPath))
    } finally merged.unpersist()
  }

  /** Maintain the fuzzy-search vocabulary from a DOCUMENT stream — the
    * at-rest artifact behind the SymSpell deletion index, the term
    * suggester, and the phrase suggester's candidate generator
    * ([[graft.query.Fuzzy]]): per micro-batch, per-doc-distinct term
    * counts append as `(term, freq, inc_batch_id)`. Document frequencies
    * are integer sums, so the corpus-so-far vocabulary is one group-sum
    * away and every fuzzy serve path runs WITHOUT re-reading corpus
    * text. Same replay contract as [[maintainGramDf]]: per-(term, epoch)
    * dedup makes retried appends idempotent.
    */
  def maintainFuzzyVocab(
      docs: DataFrame,
      textCol: String,
      incrementPath: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.query.Fuzzy.vocabularyWithFreq(batch, col(s"`$textCol`"))
          .withColumn("inc_batch_id", lit(batchId))
          .write.mode("append").parquet(incrementPath)
      }
      .start()

  /** The corpus-so-far `(term, freq)` vocabulary implied by
    * [[maintainFuzzyVocab]]'s increments: replay-deduped per
    * (term, epoch), then sum-merged — feed it straight to
    * [[graft.query.Fuzzy.suggestTermsFromVocab]] /
    * [[graft.query.Fuzzy.deletionIndex]].
    */
  def fuzzyVocabFromIncrements(
      spark: org.apache.spark.sql.SparkSession,
      incrementPath: String): DataFrame =
    spark.read.parquet(incrementPath)
      .dropDuplicates(Seq("term", "inc_batch_id"))
      .groupBy("term").agg(sum(col("freq")).as("freq"))

  /** Compact a fuzzy-vocabulary increment table to one row per term via
    * the staged swap (sentinel epoch keeps replay dedup armed — the
    * [[compactGramDfIncrements]] contract).
    */
  def compactFuzzyVocabIncrements(
      spark: org.apache.spark.sql.SparkSession,
      incrementPath: String): Unit = {
    val merged = fuzzyVocabFromIncrements(spark, incrementPath)
      .withColumn("inc_batch_id", lit(-1L))
      .coalesce(1)
      .cache()
    try {
      merged.count() // materialize BEFORE touching the directory being read
      val staged = incrementPath + ".compacting"
      merged.write.mode("overwrite").parquet(staged)
      val fs = graft.store.FsOps.fileSystem(spark, staged)
      graft.store.FsOps.promote(fs,
        new org.apache.hadoop.fs.Path(staged),
        new org.apache.hadoop.fs.Path(incrementPath))
    } finally merged.unpersist()
  }

  /** Maintain the unigram piece-count artifact from a DOCUMENT stream
    * ([[graft.ops.Unigram]]): per micro-batch, the RAW weighted substring
    * counts append with epochs — integer sums, merge-safe precisely
    * because pruning lives at SERVE time
    * ([[graft.ops.Unigram.segmentCountsWithPieces]] prunes the MERGED
    * counts; pruning per batch would lose sub-minCount mass that later
    * batches complete). Tokenize any corpus against the vocabulary-so-far
    * without re-reading corpus text.
    */
  def maintainUnigramPieces(
      docs: DataFrame,
      textCol: String,
      maxPieceLen: Int,
      incrementPath: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.ops.Unigram.pieceCounts(batch, textCol, maxPieceLen)
          .withColumn("inc_batch_id", lit(batchId))
          .write.mode("append").parquet(incrementPath)
      }
      .start()

  /** The corpus-so-far raw piece counts implied by
    * [[maintainUnigramPieces]]'s increments: replay-deduped per
    * (piece, epoch), then summed — feed straight to
    * [[graft.ops.Unigram.segmentCountsWithPieces]].
    */
  def unigramPiecesFromIncrements(
      spark: org.apache.spark.sql.SparkSession,
      incrementPath: String): DataFrame =
    spark.read.parquet(incrementPath)
      .dropDuplicates(Seq("piece", "inc_batch_id"))
      .groupBy("piece").agg(sum(col("cnt")).as("cnt"))

  /** Maintain the bigram-LM state from a DOCUMENT stream — the model
    * behind the perplexity gate ([[graft.ops.NgramLm.perplexityScore]])
    * and Moore–Lewis selection ([[graft.ops.NgramLm.contrastScores]]):
    * per micro-batch, `(w1, w2, c2)` bigram counts append with epochs.
    * Bigram counts are integer sums, so the corpus-so-far model is one
    * replay-deduped group-sum away, and a NEW batch scores against the
    * model-so-far WITHOUT re-reading corpus text — the CCNet deployment
    * shape (train once on the reference corpus, gate every later crawl).
    */
  def maintainBigramLm(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      incrementPath: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.ops.NgramLm.bigramCounts(batch, idCol, textCol)
          .withColumn("inc_batch_id", lit(batchId))
          .write.mode("append").parquet(incrementPath)
      }
      .start()

  /** The corpus-so-far `(bigrams, contexts)` model implied by
    * [[maintainBigramLm]]'s increments — replay-deduped per
    * ((w1, w2), epoch), summed, then EXACTLY [[graft.ops.NgramLm.train]]'s
    * derivation: context totals from the FULL summed table (pruning the
    * head never changes a denominator), both pruned to `minCount`. Feed
    * straight to [[graft.ops.NgramLm.scoreDocs]].
    */
  def bigramLmFromIncrements(
      spark: org.apache.spark.sql.SparkSession,
      incrementPath: String,
      minCount: Int = 2): (DataFrame, DataFrame) = {
    val c2 = spark.read.parquet(incrementPath)
      .dropDuplicates(Seq("w1", "w2", "inc_batch_id"))
      .groupBy("w1", "w2").agg(sum(col("c2")).as("c2"))
    val contexts = c2.groupBy(col("w1"))
      .agg(sum(col("c2")).as("c1"))
      .where(col("c1") >= minCount)
    (c2.where(col("c2") >= minCount), contexts)
  }

  /** Compact a bigram-count increment table to one row per bigram via the
    * staged swap ([[compactGramDfIncrements]]'s contract: sentinel epoch
    * keeps replay dedup armed; bigram cardinality grows with the corpus,
    * so cadence matters like the gram-df case).
    */
  def compactBigramLmIncrements(
      spark: org.apache.spark.sql.SparkSession,
      incrementPath: String): Unit = {
    val merged = spark.read.parquet(incrementPath)
      .dropDuplicates(Seq("w1", "w2", "inc_batch_id"))
      .groupBy("w1", "w2").agg(sum(col("c2")).as("c2"))
      .withColumn("inc_batch_id", lit(-1L))
      .coalesce(1)
      .cache()
    try {
      merged.count() // materialize BEFORE touching the directory being read
      val staged = incrementPath + ".compacting"
      merged.write.mode("overwrite").parquet(staged)
      val fs = graft.store.FsOps.fileSystem(spark, staged)
      graft.store.FsOps.promote(fs,
        new org.apache.hadoop.fs.Path(staged),
        new org.apache.hadoop.fs.Path(incrementPath))
    } finally merged.unpersist()
  }

  /** Maintain the ExactSubstr gram-count state from a document stream:
    * per micro-batch, the sliding `minLen`-gram occurrence counts
    * ([[graft.ops.Dedup.slidingGramPostings]]) append at rest as
    * `(g, n, inc_batch_id)` — occurrence counts are sum-mergeable, so the
    * corpus-so-far state is a group-sum away and an arriving batch
    * deduplicates against it WITHOUT re-reading any corpus text
    * ([[graft.ops.Dedup.duplicateSpanRemovalAgainst]]). Same replay
    * contract as [[maintainGramDf]] (per-(gram, epoch) dedup), same
    * compaction ([[compactSpanGramIncrements]]).
    */
  def maintainSpanGramCounts(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minLen: Int,
      incrementPath: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.ops.Dedup.slidingGramPostings(batch, idCol, textCol, minLen)
          .groupBy(col("_g").as("g")).agg(count(lit(1)).as("n"))
          .withColumn("inc_batch_id", lit(batchId))
          .write.mode("append").parquet(incrementPath)
      }
      .start()

  /** The corpus-so-far gram counts implied by [[maintainSpanGramCounts]]'s
    * increments: replay-deduped per (gram, epoch), sum-merged — the
    * `(g, n)` shape [[graft.ops.Dedup.duplicateSpanRemovalAgainst]]
    * consumes.
    */
  def spanGramCountsFromIncrements(
      spark: org.apache.spark.sql.SparkSession,
      incrementPath: String): DataFrame =
    spark.read.parquet(incrementPath)
      .dropDuplicates(Seq("g", "inc_batch_id"))
      .groupBy("g").agg(sum(col("n")).as("n"))

  /** Compact a span-gram increment table to one row per gram — the
    * [[compactGramDfIncrements]] staged swap on the `(g, n)` schema.
    */
  def compactSpanGramIncrements(
      spark: org.apache.spark.sql.SparkSession,
      incrementPath: String): Unit = {
    val merged = spanGramCountsFromIncrements(spark, incrementPath)
      .withColumn("inc_batch_id", lit(-1L))
      .coalesce(1)
      .cache()
    try {
      merged.count()
      val staged = incrementPath + ".compacting"
      merged.write.mode("overwrite").parquet(staged)
      val fs = graft.store.FsOps.fileSystem(spark, staged)
      graft.store.FsOps.promote(fs,
        new org.apache.hadoop.fs.Path(staged),
        new org.apache.hadoop.fs.Path(incrementPath))
    } finally merged.unpersist()
  }

  /** Maintain the DSIR importance model from a document stream: per
    * micro-batch, [[graft.ops.Sampling.importanceModel]]'s `(b, cr, ct)`
    * bucket counts append at rest stamped with the epoch — the model is
    * bucket-wise sum-mergeable (its defining property), so the corpus-
    * so-far model is a group-sum away at serve time and incoming documents
    * score against it without re-reading any corpus text
    * ([[graft.ops.Sampling.importanceScoresAgainst]]). Increment volume is
    * ≤ `numBuckets` rows per batch — FIXED-width by construction, the
    * smallest maintenance payload of any streamed artifact here. Same
    * replay contract as [[maintainGramDf]]: per-batch epochs dedup retried
    * appends (the increment rows are a pure function of the batch).
    */
  def maintainImportanceModel(
      docs: DataFrame,
      textCol: String,
      targetCond: Column,
      incrementPath: String,
      checkpointDir: String,
      numBuckets: Int = 1024): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.ops.Sampling.importanceModel(batch, textCol, targetCond, numBuckets)
          .withColumn("inc_batch_id", lit(batchId))
          .write.mode("append").parquet(incrementPath)
      }
      .start()

  /** The corpus-so-far DSIR model implied by [[maintainImportanceModel]]'s
    * increments: replay-deduped per (bucket, epoch), then bucket-summed —
    * `(b, cr, ct)`, [[graft.ops.Sampling.importanceWeights]]'s input.
    */
  def importanceModelFromIncrements(
      spark: org.apache.spark.sql.SparkSession,
      incrementPath: String): DataFrame =
    spark.read.parquet(incrementPath)
      .dropDuplicates(Seq("b", "inc_batch_id"))
      .groupBy("b")
      .agg(sum(col("cr")).as("cr"), sum(col("ct")).as("ct"))

  /** Compact an importance-model increment table to one row per bucket via
    * the same staged swap as [[compactGramDfIncrements]]; bounded at
    * `numBuckets` rows, sentinel epoch keeps replay dedup armed.
    */
  def compactImportanceModelIncrements(
      spark: org.apache.spark.sql.SparkSession,
      incrementPath: String): Unit = {
    val merged = importanceModelFromIncrements(spark, incrementPath)
      .withColumn("inc_batch_id", lit(-1L))
      .coalesce(1)
      .cache()
    try {
      merged.count() // materialize BEFORE touching the directory being read
      val staged = incrementPath + ".compacting"
      merged.write.mode("overwrite").parquet(staged)
      val fs = graft.store.FsOps.fileSystem(spark, staged)
      graft.store.FsOps.promote(fs,
        new org.apache.hadoop.fs.Path(staged),
        new org.apache.hadoop.fs.Path(incrementPath))
    } finally merged.unpersist()
  }

  /** Maintain drift-detection histograms from a document stream: per
    * micro-batch, each named bucketing's counts append at rest stamped
    * with the epoch — histogram counts are sum-mergeable (the defining
    * property every increment table here shares), so the corpus-so-far
    * histogram is a group-sum away and [[graft.ops.Drift]]'s comparisons
    * run against a FROZEN reference snapshot without re-reading any
    * corpus text. Increment volume per batch is Σ bucket cardinalities —
    * a schema property, not a data-volume one. Same replay contract as
    * [[maintainGramDf]] (per-(feature, bucket, epoch) dedup).
    */
  def maintainDriftHistograms(
      docs: DataFrame,
      features: Seq[(String, Column)],
      incrementPath: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery = {
    require(features.nonEmpty, "maintainDriftHistograms: at least one feature")
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        features.map { case (name, bucket) =>
          batch.groupBy(bucket.cast("string").as("bucket"))
            .agg(count(lit(1)).as("n"))
            .select(lit(name).as("feature"), col("bucket"), col("n"))
        }.reduce(_.unionByName(_))
          .withColumn("inc_batch_id", lit(batchId))
          .write.mode("append").parquet(incrementPath)
      }
      .start()
  }

  /** The corpus-so-far histograms implied by [[maintainDriftHistograms]]'
    * increments: replay-deduped per (feature, bucket, epoch), then
    * sum-merged — `(feature, bucket, n)`. Feed two of these (or one
    * against a frozen reference) to [[driftFromHistograms]].
    */
  def driftHistogramsFromIncrements(
      spark: org.apache.spark.sql.SparkSession,
      incrementPath: String): DataFrame =
    spark.read.parquet(incrementPath)
      .dropDuplicates(Seq("feature", "bucket", "inc_batch_id"))
      .groupBy("feature", "bucket")
      .agg(sum(col("n")).as("n"))

  /** [[graft.ops.Drift.driftReport]] computed from two HISTOGRAM frames
    * (`(feature, bucket, n)`) instead of two corpora — the serve-time
    * form for streamed maintenance: shares derive per feature, the
    * compare is the same full-outer bucket join and exact-arithmetic
    * TVD / symmetric chi-square.
    */
  def driftFromHistograms(a: DataFrame, b: DataFrame): DataFrame = {
    def shares(df: DataFrame) = df
      .withColumn("_tot", sum(col("n")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("feature")))
      .select(col("feature"), col("bucket"),
        (col("n").cast("double") / col("_tot").cast("double")).as("share"))
    shares(a).withColumnRenamed("share", "p")
      .join(shares(b).withColumnRenamed("share", "q"),
        Seq("feature", "bucket"), "full_outer")
      .select(col("feature"),
        coalesce(col("p"), lit(0.0)).as("p"),
        coalesce(col("q"), lit(0.0)).as("q"))
      .groupBy("feature")
      .agg(count(lit(1)).as("n_buckets"),
        round(sum(abs(col("p") - col("q"))) / 2.0, 6).as("tvd"),
        round(sum((col("p") - col("q")) * (col("p") - col("q")) /
          (col("p") + col("q"))), 6).as("chi2_sym"),
        round(sum(when(col("p") > 0 && col("q") > 0,
          (col("p") - col("q")) * log(col("p") / col("q"))).otherwise(lit(0.0))),
          6).as("psi"))
  }

  /** Maintain an at-rest IVF ANN index from a vector stream: per
    * micro-batch, [[graft.ops.Similarity.assignCells]] assigns incoming
    * vectors to the FROZEN centroid table (row-local, centroids are plan
    * literals — no shuffle beyond the cell-partitioned write) and appends
    * `(vec_id, vec, cell, inc_batch_id)` partitioned by cell — index
    * freshness is an append, serving prunes to probed cells, and the
    * same replay contract as every increment table here applies (epoch
    * stamps dedup retried appends). Centroid drift under a shifting
    * distribution is the documented FAISS add-after-train trade; retrain
    * + reassign on a cadence (a rebuild of the partitioned table, not of
    * the serving code — [[graft.ops.Similarity.ivfTopKFromIndex]] reads
    * whatever index is current).
    */
  def maintainIvfIndex(
      vecs: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: Seq[Array[Double]],
      indexPath: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    vecs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.ops.Similarity.assignCells(batch, idCol, vecCol, centroids)
          .withColumn("inc_batch_id", lit(batchId))
          .write.mode("append").partitionBy("cell").parquet(indexPath)
      }
      .start()

  /** The servable index implied by [[maintainIvfIndex]]'s appends: the
    * LATEST epoch wins per vec_id. This subsumes replay dedup (a retried
    * epoch's rows are identical — assignment is a pure function of the
    * vector and the frozen centroids — and one survives) AND makes a
    * vector legitimately re-emitted in a later micro-batch an UPDATE: its
    * newest embedding/cell is the served one, instead of both rows
    * persisting and a stale duplicate occupying a top-k slot in
    * [[graft.ops.Similarity.ivfTopKFromIndex]].
    */
  def ivfIndexFromIncrements(
      spark: org.apache.spark.sql.SparkSession,
      indexPath: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id").orderBy(desc("inc_batch_id"))
    spark.read.parquet(indexPath)
      .withColumn("_r", row_number().over(w))
      .where(col("_r") === 1)
      .select("vec_id", "vec", "cell")
  }

  /** Compact an IVF-index increment table to its SERVED rows — the
    * latest epoch per vec_id ([[ivfIndexFromIncrements]]), stamped with
    * the sentinel epoch and swapped in via the staged-promote contract
    * ([[compactGramDfIncrements]]). Unlike the sum-merge compactions this
    * one materializes a LATEST-WINS view: update churn (a vector
    * re-emitted across epochs) leaves exactly one row, and the per-vec
    * window [[ivfIndexFromIncrements]] pays on every serve-view rebuild
    * shrinks back to one epoch's worth of rows. Post-compaction appends
    * keep the update semantic — any real batch epoch (≥ 0) outranks the
    * sentinel, so a re-emitted vector still wins over its compacted row.
    *
    * The index is corpus-sized (one row per vector), so the compacted
    * write repartitions ON the partition key — one task per cell, one
    * file per directory — instead of the `coalesce(1)` the
    * vocabulary-sized increment tables use; a single writer task funneling
    * the whole index is exactly the driver-shaped bottleneck the
    * cell-partitioned layout exists to avoid.
    */
  def compactIvfIndexIncrements(
      spark: org.apache.spark.sql.SparkSession,
      indexPath: String): Unit = {
    val merged = ivfIndexFromIncrements(spark, indexPath)
      .withColumn("inc_batch_id", lit(-1L))
      .repartition(col("cell"))
    // r18 optimization: the staged WRITE is itself the materialization —
    // it reads the source directory and lands in `.compacting`; the
    // source is only touched by the promote AFTER the write completed.
    // The former cache()+count() pre-pass was a full extra execution of
    // the corpus-sized merge view (a leftover from a pre-staged-swap
    // shape), real money here unlike the coalesce(1) vocabulary-sized
    // compactions, which keep the uniform defensive pattern.
    val staged = indexPath + ".compacting"
    merged.write.mode("overwrite").partitionBy("cell").parquet(staged)
    val fs = graft.store.FsOps.fileSystem(spark, staged)
    graft.store.FsOps.promote(fs,
      new org.apache.hadoop.fs.Path(staged),
      new org.apache.hadoop.fs.Path(indexPath))
  }

  /** Streamed maintenance of the at-rest SPARSE POSTINGS index (the
    * `sparse_vector` serving table, [[graft.query.SparseVector]]): each
    * arriving document batch appends its term-bucket-partitioned tf
    * postings stamped with the epoch — index freshness is an APPEND,
    * exactly the [[maintainIvfIndex]] contract with `term_bucket` as
    * the partition key instead of `cell`.
    */
  def maintainPostings(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      numBuckets: Int,
      postingsPath: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.query.SparseVector.tfPostingsBucketed(batch, idCol, textCol, numBuckets)
          .withColumn("inc_batch_id", lit(batchId))
          .write.mode("append").partitionBy("term_bucket").parquet(postingsPath)
      }
      .start()

  /** The servable postings implied by [[maintainPostings]]' appends:
    * per DOCUMENT, only its latest epoch's rows survive — which both
    * absorbs at-least-once replays (a retried epoch's rows are
    * identical; the per-(doc, term) dedup keeps one) and makes a
    * re-emitted document an UPDATE in the strong sense: a term the new
    * text DROPPED disappears from the index (the per-(doc, term)
    * latest-epoch rule [[ivfIndexFromIncrements]] uses would keep such
    * orphan terms serving forever — postings are a SET replaced per doc,
    * not a value updated per key, so the epoch cut must be per doc).
    */
  def postingsFromIncrements(
      spark: org.apache.spark.sql.SparkSession,
      idCol: String,
      postingsPath: String): DataFrame = {
    val perDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col(s"`$idCol`"))
    val raw = spark.read.parquet(postingsPath)
    // carry the layout's num_buckets contract column through to serving
    // ([[graft.query.SparseVector.score]] verifies its argument against it)
    val keep = Seq(idCol, "term", "weight", "term_bucket") ++
      (if (raw.columns.contains("num_buckets")) Seq("num_buckets") else Nil)
    raw
      .withColumn("_maxe", max(col("inc_batch_id")).over(perDoc))
      .where(col("inc_batch_id") === col("_maxe"))
      .dropDuplicates(idCol, "term")
      .select(keep.map(c => col(s"`$c`")): _*)
  }

  /** Compact a sparse-postings increment table to its SERVED rows — the
    * per-DOC latest-epoch cut of [[postingsFromIncrements]] (a compacted
    * re-emitted doc keeps only its FINAL term set; the per-key rule the
    * IVF compaction uses would resurrect dropped terms), stamped with the
    * sentinel epoch and swapped in via the staged-promote contract. This
    * bounds the table at one row per live (doc, term) no matter how many
    * epochs have run, and the full-history per-doc window the serve view
    * pays per rebuild shrinks to the live rows. Post-compaction appends
    * keep the update semantic: a real epoch (≥ 0) outranks the sentinel,
    * so a doc re-emitted after compaction replaces its compacted term set
    * whole. Corpus-sized table → repartition on the partition key
    * (one task per bucket; see [[compactIvfIndexIncrements]]).
    */
  def compactPostingsIncrements(
      spark: org.apache.spark.sql.SparkSession,
      idCol: String,
      postingsPath: String): Unit = {
    val merged = postingsFromIncrements(spark, idCol, postingsPath)
      .withColumn("inc_batch_id", lit(-1L))
      .repartition(col("term_bucket"))
    // r18 optimization: staged write IS the materialization; promote only
    // touches the source after it completes — the former cache()+count()
    // pre-pass double-executed the corpus-sized merge view (see
    // compactIvfIndexIncrements).
    val staged = postingsPath + ".compacting"
    merged.write.mode("overwrite").partitionBy("term_bucket").parquet(staged)
    val fs = graft.store.FsOps.fileSystem(spark, staged)
    graft.store.FsOps.promote(fs,
      new org.apache.hadoop.fs.Path(staged),
      new org.apache.hadoop.fs.Path(postingsPath))
  }

  /** Streamed maintenance of the SQ8 quantization bounds: each arriving
    * micro-batch appends its per-dimension `(dim, mn, mx)` increment
    * ([[graft.ops.Similarity.sqBoundsFrame]]). min/max are idempotent and
    * commutative, so this is the SIMPLEST possible maintained index —
    * at-least-once replays and batch boundaries vanish by algebra, no
    * dedup or epoch bookkeeping (the bounds can only WIDEN as data
    * arrives, FAISS's add-after-train contract in its mildest form;
    * retrain on a cadence if the distribution tightens).
    */
  def maintainSqBounds(
      vecs: DataFrame,
      vecCol: String,
      dim: Int,
      boundsPath: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    vecs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.ops.Similarity.sqBoundsFrame(batch, vecCol, dim)
          .withColumn("inc_batch_id", lit(batchId))
          .write.mode("append").parquet(boundsPath)
      }
      .start()

  /** The servable bounds implied by [[maintainSqBounds]]'s appends: one
    * `groupBy(dim).agg(min, max)` over the increment table — equal to the
    * from-scratch full-corpus bounds whenever the increments cover the
    * corpus (the `ann_sq8_incremental` oracle equivalence).
    */
  def sqBoundsFromIncrements(
      spark: org.apache.spark.sql.SparkSession,
      boundsPath: String): (Array[Double], Array[Double]) = {
    val rows = spark.read.parquet(boundsPath)
      .groupBy("dim").agg(min("mn").as("mn"), max("mx").as("mx"))
      .orderBy("dim")
      .select("dim", "mn", "mx")
      .collect()
    val dim = rows.length
    val mn = new Array[Double](dim)
    val mx = new Array[Double](dim)
    rows.foreach { r =>
      val j = r.getInt(0)
      mn(j) = r.getDouble(1)
      mx(j) = r.getDouble(2)
    }
    (mn, mx)
  }

  /** Compact a rollup-increment table to one row per dimension combination
    * via the same staged swap as [[compactIncrements]] (pause the writer or
    * call from its own cadence). The compacted row wears the sentinel epoch
    * so the table stays single-schema and replay dedup stays armed.
    */
  def compactRollupIncrements(
      spark: org.apache.spark.sql.SparkSession,
      incrementPath: String): Unit = {
    val merged = rollupFromIncrements(spark, incrementPath)
      .withColumn("inc_batch_id", lit(-1L))
      .coalesce(1)
      .cache()
    try {
      merged.count() // materialize BEFORE touching the directory being read
      val staged = incrementPath + ".compacting"
      merged.write.mode("overwrite").parquet(staged)
      val fs = graft.store.FsOps.fileSystem(spark, staged)
      graft.store.FsOps.promote(fs,
        new org.apache.hadoop.fs.Path(staged),
        new org.apache.hadoop.fs.Path(incrementPath))
    } finally merged.unpersist()
  }

  /** [[maintainRollup]] for a rollup carrying HLL sketch measures
    * ([[graft.query.PreAgg.incrementWithSketches]] — the Unique Count
    * serving path for fields too high-cardinality to be dimensions): each
    * batch appends its own sketched rollup under an epoch stamp. The
    * replay contract is unchanged — a foreachBatch retry re-appends a
    * whole epoch, a combo appears at most once per epoch, and the
    * recomputed sketch bytes are identical (the register state is a pure
    * function of the batch's value multiset) — so per-(combo, epoch) dedup
    * drops exactly the replays.
    */
  def maintainSketchedRollup(
      events: DataFrame,
      dims: Seq[(String, Column)],
      sketches: Seq[(String, Column)],
      incrementPath: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.query.PreAgg.incrementWithSketches(batch, dims, sketches)
          .withColumn("inc_batch_id", lit(batchId))
          .write.mode("append").parquet(incrementPath)
      }
      .start()

  /** The current sketched serving rollup implied by
    * [[maintainSketchedRollup]]'s increments: replay-dedup per (dimension
    * combo, epoch), then [[graft.query.PreAgg.mergeSketched]] (group-sum
    * counts, register-max union sketches). Feeds
    * [[graft.query.PreAgg.termsUniqueCountSketch]] unchanged.
    */
  def sketchedRollupFromIncrements(
      spark: org.apache.spark.sql.SparkSession,
      incrementPath: String): DataFrame = {
    val inc = spark.read.parquet(incrementPath)
    val dims = inc.columns.filter(c =>
      c != graft.query.PreAgg.CntCol && c != "inc_batch_id" &&
        !c.endsWith(graft.query.PreAgg.SketchSuffix))
    graft.query.PreAgg.mergeSketched(
      inc.dropDuplicates(dims :+ "inc_batch_id").drop("inc_batch_id"))
  }

  /** Compact a sketched-rollup increment table to one row per dimension
    * combo (counts summed, sketches unioned) via the same staged swap and
    * sentinel epoch as [[compactRollupIncrements]].
    */
  def compactSketchedRollupIncrements(
      spark: org.apache.spark.sql.SparkSession,
      incrementPath: String): Unit = {
    val merged = sketchedRollupFromIncrements(spark, incrementPath)
      .withColumn("inc_batch_id", lit(-1L))
      .coalesce(1)
      .cache()
    try {
      merged.count() // materialize BEFORE touching the directory being read
      val staged = incrementPath + ".compacting"
      merged.write.mode("overwrite").parquet(staged)
      val fs = graft.store.FsOps.fileSystem(spark, staged)
      graft.store.FsOps.promote(fs,
        new org.apache.hadoop.fs.Path(staged),
        new org.apache.hadoop.fs.Path(incrementPath))
    } finally merged.unpersist()
  }

  /** Compact an increment table: merge the accumulated per-batch rows into
    * ONE increment per column and swap it in, bounding the table at columns
    * × 1 rows no matter how many batches have run. Safe at any time —
    * merging is associative and commutative, so compaction commutes with
    * concurrent appends only if the writer is paused; call it from the
    * maintenance cadence that owns the table (the streaming query's own
    * `foreachBatch` epoch, a nightly job). The swap is write-new → move-old
    * → promote — the same recover-by-re-merge posture as the appends (on a
    * real deployment this seam is a transactional table format's atomic
    * commit).
    */
  def compactIncrements(
      spark: org.apache.spark.sql.SparkSession,
      incrementPath: String): Unit = {
    val merged = graft.dict.Dictionary
      .mergeIncrements(dedupedIncrements(spark.read.parquet(incrementPath)))
      // Keep the table single-schema: later streaming appends carry
      // inc_batch_id, and a parquet directory mixing stamped and unstamped
      // files can resolve to either schema at read time — if the unstamped
      // footer wins, the replay dedup silently disables. The compacted row
      // wears a sentinel epoch instead.
      .withColumn("inc_batch_id", org.apache.spark.sql.functions.lit(-1L))
      .coalesce(1)
      .cache()
    try {
      merged.count() // materialize BEFORE touching the directory being read
      val staged = incrementPath + ".compacting"
      merged.write.mode("overwrite").parquet(staged)
      val fs = graft.store.FsOps.fileSystem(spark, staged)
      graft.store.FsOps.promote(fs,
        new org.apache.hadoop.fs.Path(staged),
        new org.apache.hadoop.fs.Path(incrementPath))
    } finally merged.unpersist()
  }

  /** Batch sessionization — the backfill twin of [[sessionize]]: a gap of
    * more than `gapMs` between consecutive events of a user starts a new
    * session. Pure window algebra (lag → gap flag → running sum = session id
    * → group), partitioned by user: one shuffle on the user key, per-user
    * local sort, no state store and no driver-side work — the shape that
    * holds at 100 TB.
    *
    * @param idCol unique tiebreak for events sharing a timestamp, so session
    *              boundaries are deterministic under any partitioning.
    */
  def sessionizeBatch(
      events: DataFrame,
      gapMs: Long = 30 * 60 * 1000L,
      tsCol: String = "ts",
      userCol: String = "user_id",
      valueCol: String = "value",
      idCol: String = "event_id"): DataFrame = {
    val order = Seq(col(tsCol), col(idCol))
    val w = Window.partitionBy(col(userCol)).orderBy(order: _*)
    val prevTs = lag(col(tsCol), 1).over(w)
    val newSession = when(
      prevTs.isNull || unix_millis(col(tsCol)) - unix_millis(prevTs) > gapMs, 1L
    ).otherwise(0L)
    events
      .withColumn("_new_session", newSession)
      .withColumn("_session_id",
        sum(col("_new_session")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(userCol), col("_session_id"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col(valueCol)).as("total_value"))
      .drop("_session_id")
  }
}
