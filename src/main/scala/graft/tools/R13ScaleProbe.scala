package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale measurements for the round-13 changes, same protocol as
  * [[OpScaleProbe]] (min/median wall seconds over repeats, 1× = sf0.1,
  * 10× = the ScaleGen twin at `/tmp/graft_sf1`):
  *
  *  - `kmeans_build` capped vs uncapped: the trainCap'd k-means must hold
  *    its refinement cost ~flat as the corpus grows (the refinement loop
  *    re-scans the localCheckpointed ≈cap-row sample; only the fixed
  *    count+filter prologue sees the corpus), while uncapped training
  *    grows with rows AND its per-cell `collect_list` buffers grow ~n/k —
  *    the OOM shape the cap removes. The probe also records the training
  *    row count, so boundedness is verified structurally.
  *  - `drift_report` at 3 and 6 features: the unpivoted single-pass form
  *    must cost ~the 2-scan constant regardless of F (the round-12 form
  *    was 2F scans — F-proportional).
  *  - `rolling_examples` on a SKEWED corpus (30% of events remapped to
  *    one mega-entity): unchunked serializes the mega-entity's window in
  *    one task; `chunkMs` spreads it across span/chunk tasks with
  *    identical output (FeaturesSpec/oracle-pinned).
  *
  * Usage: `runMain graft.tools.R13ScaleProbe [repeats=3]` after ScaleGen
  * has produced `/tmp/graft_sf1`. Emits one JSON line per measurement.
  */
object R13ScaleProbe {

  private def timeOp(repeats: Int)(op: => Long): (Double, Double, Long) = {
    var rows = 0L
    val times = (1 to repeats).map { _ =>
      val t0 = System.nanoTime()
      rows = op
      (System.nanoTime() - t0) / 1e9
    }.sorted
    (times.min, times(times.size / 2), rows)
  }

  private def loadAvg(): Double =
    scala.io.Source.fromFile("/proc/loadavg").getLines().next().split(" ")(0).toDouble

  def main(args: Array[String]): Unit = {
    val repeats = if (args.nonEmpty) args(0).toInt else 3
    val spark = SparkSession.builder()
      .appName("graft-r13-scale-probe")
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(s"""{"probe":"r13_scale","load_start":${loadAvg()}}""")
    // SPARK_GRAFT_SECTIONS=kmeans,drift,skew restricts (default all) —
    // the skew section's serialized 9M-row windows dominate a full run.
    val sections = sys.env.getOrElse("SPARK_GRAFT_SECTIONS", "kmeans,drift,skew")
      .split(",").toSet

    def emit(label: String, op: String, r: (Double, Double, Long)): Unit =
      println(s"""{"probe":"r13_scale","scale":"$label","op":"$op",""" +
        s""""min_s":${math.round(r._1 * 1000) / 1000.0},""" +
        s""""med_s":${math.round(r._2 * 1000) / 1000.0},"rows":${r._3}}""")

    // ---- 1. capped vs uncapped k-means build (100× twin when present) ----
    val kmeansScales = Seq(("1x", "/root/testdata/sf0.1"), ("10x", "/tmp/graft_sf1")) ++
      (if (new java.io.File("/tmp/graft_sf10/embeddings.parquet").exists())
        Seq(("100x", "/tmp/graft_sf10")) else Nil)
    for ((label, dir) <- kmeansScales if sections("kmeans")) {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      emb.count()
      emit(label, "kmeans_build_uncapped", timeOp(repeats) {
        graft.ops.Similarity.kmeansCentroids(emb, "vec_id", "embedding",
          k = 16, iters = 2).size.toLong
      })
      emit(label, "kmeans_build_cap4096", timeOp(repeats) {
        graft.ops.Similarity.kmeansCentroids(emb, "vec_id", "embedding",
          k = 16, iters = 2, trainCap = 4096).size.toLong
      })
      // structural: how many rows does capped training actually touch
      val n = emb.count()
      val trainRows = graft.ops.Similarity.trainingFrame(
        emb.select(col("vec_id").as("_id")), "_id", 4096, 42,
        materialize = false).count()
      println(s"""{"probe":"r13_scale","scale":"$label","op":"kmeans_train_rows",""" +
        s""""corpus_rows":$n,"train_rows":$trainRows}""")
    }

    // ---- 2. single-pass drift report, F = 3 and 6 features ----
    for ((label, dir) <- Seq(("1x", "/root/testdata/sf0.1"), ("10x", "/tmp/graft_sf1"))
        if sections("drift")) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      docs.count()
      val a = docs.where(pmod(col("doc_id"), lit(2)) === 0)
      val b = docs.where(pmod(col("doc_id"), lit(2)) === 1)
      val feats3 = Seq(
        "lang" -> col("lang"),
        "source" -> col("source"),
        "tok_decade" ->
          (floor(graft.ops.TextAnalysis.tokenCount(col("text")) / 10) * 10))
      val feats6 = feats3 ++ Seq(
        "len_kb" -> floor(length(col("text")) / 1024),
        "id_mod" -> pmod(col("doc_id"), lit(7)),
        "has_digit" -> col("text").rlike("[0-9]"))
      emit(label, "drift_report_f3", timeOp(repeats) {
        graft.ops.Drift.driftReport(a, b, feats3).count()
      })
      emit(label, "drift_report_f6", timeOp(repeats) {
        graft.ops.Drift.driftReport(a, b, feats6).count()
      })
    }

    // ---- 2b. round-13 second-batch ops at 1x/10x ----
    // duplicate-span removal (sliding-gram postings + coverage join +
    // document reassembly — the only new op with super-scan volume),
    // string_stats (char explode), frequent pairs (per-txn self-join).
    for ((label, dir) <- Seq(("1x", "/root/testdata/sf0.1"), ("10x", "/tmp/graft_sf1"))
        if sections("newops")) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      docs.count()
      emit(label, "duplicate_span_removal", timeOp(repeats) {
        graft.ops.Dedup.duplicateSpanRemoval(docs, "doc_id", "text", minLen = 8)
          .agg(count(lit(1)), sum("n_removed")).collect()(0).getLong(0)
      })
      emit(label, "string_stats", timeOp(repeats) {
        graft.query.Aggs.stringStats(docs, "text").collect()(0).getLong(0)
      })
      val evPath =
        if (label == "1x") "/root/testdata/sf0.1/events.parquet"
        else {
          // OpScaleProbe's 10x twin construction: remapped ids, unchanged
          // ts/type/value — per-user itemsets identical per copy
          val p = "/tmp/graft_events_probe10/events.parquet"
          if (!new java.io.File(p).exists()) {
            val src = spark.read.parquet("/root/testdata/sf0.1/events.parquet")
            src.withColumn("_k", explode(sequence(lit(0), lit(9))))
              .select((col("event_id") * 10 + col("_k")).as("event_id"),
                col("ts"), (col("user_id") * 10 + col("_k")).as("user_id"),
                col("event_type"), col("value"))
              .repartition(32).write.mode("overwrite").parquet(p)
          }
          p
        }
      val ev = spark.read.parquet(evPath)
      ev.count()
      emit(label, "frequent_item_pairs", timeOp(repeats) {
        graft.query.Aggs.frequentItemPairs(ev, "user_id", "event_type",
          minSupport = 10, n = 100).count()
      })
    }

    // ---- 2c. round-13 fourth batch: variable-width histogram ----
    // The scan pays one corpus aggregation; the serve re-clusters the
    // at-rest cents rollup (|distinct cents| rows — value-domain-bounded,
    // corpus-size-free). The rollup build is the ingest side and is not
    // the serve cost; both measured for the record.
    for ((label, dir) <- Seq(("1x", "/root/testdata/sf0.1"), ("10x", "/tmp/graft_sf1"))
        if sections("vwh")) {
      val evPath =
        if (label == "1x") "/root/testdata/sf0.1/events.parquet"
        else "/tmp/graft_events_probe10/events.parquet" // newops construction
      if (new java.io.File(evPath).exists()) {
        val ev = spark.read.parquet(evPath)
        ev.count()
        emit(label, "vwh_scan", timeOp(repeats) {
          graft.query.Aggs.variableWidthHistogram(ev, "value", 50L).count()
        })
        val rollPath = s"/tmp/graft_vwh_rollup_$label"
        graft.query.PreAgg.increment(ev.where(col("value").isNotNull),
            Seq("v" -> floor(col("value") * 100).cast("long")))
          .write.mode("overwrite").parquet(rollPath)
        val pre = spark.read.parquet(rollPath)
        println(s"""{"probe":"r13_scale","scale":"$label","op":"vwh_rollup_rows",""" +
          s""""corpus_rows":${ev.count()},"rollup_rows":${pre.count()}}""")
        emit(label, "vwh_serve", timeOp(repeats) {
          graft.query.PreAgg.variableWidthHistogram(pre, "v", 50L).count()
        })
      }
    }

    // ---- 2d. round-13 fifth batch: SymSpell fuzzy index ----
    // Scan form pays per-row bounded levenshtein over every token; the
    // indexed form probes a VOCABULARY-sized deletion table (Heaps' law:
    // sublinear in corpus) and touches the corpus once by semi-join.
    // Build cost is the ingest side (once, beside the _split companions);
    // serve measured against a prebuilt at-rest index.
    for ((label, dir) <- Seq(("1x", "/root/testdata/sf0.1"), ("10x", "/tmp/graft_sf1"))
        if sections("fuzzy")) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      docs.count()
      emit(label, "fuzzy_scan", timeOp(repeats) {
        docs.where(graft.query.FilterSpec.FuzzyTerm("text", "dupe", 2).compile).count()
      })
      val vocab = graft.query.Fuzzy.vocabulary(docs, col("text"))
      val idxPath = s"/tmp/graft_fuzzy_idx_$label"
      emit(label, "fuzzy_index_build", timeOp(1) {
        val idx = graft.query.Fuzzy.deletionIndex(vocab, maxEdits = 2)
        idx.write.mode("overwrite").parquet(idxPath)
        spark.read.parquet(idxPath).count()
      })
      println(s"""{"probe":"r13_scale","scale":"$label","op":"fuzzy_index_rows",""" +
        s""""corpus_rows":${docs.count()},"vocab_rows":${vocab.count()},""" +
        s""""index_rows":${spark.read.parquet(idxPath).count()}}""")
      val atRest = spark.read.parquet(idxPath)
      emit(label, "fuzzy_serve_prebuilt", timeOp(repeats) {
        val matched = graft.query.Fuzzy.matchingTerms(atRest, "dupe", 2)
        val toks = docs.withColumn("_tok", explode(split(trim(
          graft.expr.TextMatch.normalized(col("text"))), " ")))
        toks.join(broadcast(matched), toks("_tok") === matched("term"), "left_semi")
          .select("doc_id").distinct().count()
      })
    }

    // ---- 2e. round-13 sixth..twelfth batches: search/selection ops ----
    // more_like_this (tf/df/dl exchanges linear in corpus tokens),
    // phrase suggester (vocab + LM training linear; sequence scoring
    // constant), percolator (row-local single scan), rank_eval (one
    // scored run + k-row metrics), Moore-Lewis (two LM chains).
    for ((label, dir) <- Seq(("1x", "/root/testdata/sf0.1"), ("10x", "/tmp/graft_sf1"))
        if sections("search2")) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      docs.count()
      emit(label, "more_like_this", timeOp(repeats) {
        graft.query.MoreLikeThis.moreLikeThis(docs, "doc_id", "text", 42L).count()
      })
      emit(label, "suggest_phrase", timeOp(repeats) {
        graft.query.Fuzzy.suggestPhrase(docs, "doc_id", "text",
          "tabel scan fastt", maxEdits = 2, perTermCandidates = 3, n = 5).count()
      })
      val stored = graft.query.Percolator.fromStrings(Seq(
        "alert_dup" -> "text:dup",
        "alert_vs" -> """text:"vector scan"""",
        "alert_long" -> "n_chars:[400 TO *]"), defaultField = "text")
      emit(label, "percolate_3q", timeOp(repeats) {
        graft.query.Percolator.percolateLong(docs, "doc_id", stored).count()
      })
      emit(label, "rank_eval", timeOp(repeats) {
        val run = graft.query.Bm25.topKRaw(docs, "doc_id", "text",
          "dup vector scan", k = 15)
        val rel = docs.where(
          graft.expr.TextMatch.containsToken(col("text"), "dup")).select("doc_id")
        graft.query.RankEval.evaluate(run, "doc_id", "score", rel, 15).count()
      })
      emit(label, "moore_lewis", timeOp(repeats) {
        graft.ops.NgramLm.contrastScores(docs, "doc_id", "text",
          col("lang") === "en").count()
      })
    }

    // ---- 2f. round-13 fourteenth batch: unigram segmentation ----
    // The corpus-linear term is the weighted-substring vocabulary build;
    // the Viterbi DP runs over the DISTINCT-word table (Heaps-sized).
    for ((label, dir) <- Seq(("1x", "/root/testdata/sf0.1"), ("10x", "/tmp/graft_sf1"))
        if sections("unigram")) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      docs.count()
      emit(label, "unigram_segment", timeOp(repeats) {
        graft.ops.Unigram.segmentCounts(docs, "doc_id", "text",
          maxPieceLen = 4, minCount = 2, maxWordLen = 16).count()
      })
      val words = docs.select(explode(split(trim(
          graft.expr.TextMatch.normalized(col("text"))), " ")).as("w"))
        .where(length(col("w")) > 0)
      println(s"""{"probe":"r13_scale","scale":"$label","op":"unigram_words",""" +
        s""""occurrences":${words.count()},"distinct":${words.distinct().count()}}""")
    }

    // ---- 3. chunked vs unchunked rolling window on a skewed corpus ----
    // events twin replicated factor-fold with megaPct% of rows remapped to
    // ONE entity: the shape a mega-user (bot, ingestion artifact) produces
    // at 100 TB. One parameterized probe serves both the 10x sweep and the
    // 100x crossover case.
    def skewProbe(factor: Int, megaPct: Int, label: String, forms: Set[String]): Unit = {
      val skewPath = s"/tmp/graft_events_skew${factor}_$megaPct/events.parquet"
      if (!new java.io.File(skewPath).exists()) {
        val src = spark.read.parquet("/root/testdata/sf0.1/events.parquet")
        src.withColumn("_k", explode(sequence(lit(0), lit(factor - 1))))
          .select(
            (col("event_id") * factor + col("_k")).as("event_id"),
            col("ts"),
            when(pmod(col("event_id") * factor + col("_k"), lit(100)) < megaPct, lit(0L))
              .otherwise(col("user_id") * factor + col("_k")).as("user_id"),
            col("event_type"), col("value"))
          .repartition(32).write.mode("overwrite").parquet(skewPath)
      }
      val ev = spark.read.parquet(skewPath).withColumn("ts", col("ts").cast("timestamp"))
      ev.count()
      val mega = ev.where(col("user_id") === 0L).count()
      println(s"""{"probe":"r13_scale","op":"skew_shape","label":"$label","mega_pct":$megaPct,""" +
        s""""total":${ev.count()},"mega_entity_rows":$mega}""")
      // window sizes are env-tunable: the chunked win depends on the
      // chunk-to-window ratio (halo = (feature+label)/chunk extra copies),
      // so the honest demonstration needs chunk >> window
      val featMs = sys.env.getOrElse("SPARK_GRAFT_FEAT_H", "168").toLong * 3600 * 1000
      val labelMs = sys.env.getOrElse("SPARK_GRAFT_LABEL_H", "72").toLong * 3600 * 1000
      def rolling(chunk: Long): Long =
        graft.ops.Features.rollingExamples(ev, "user_id", "ts",
          anchorCond = col("event_type") === "click",
          outcomeCond = col("event_type") === "purchase",
          valueCol = floor(col("value") * 100),
          featureWindowMs = featMs,
          labelWindowMs = labelMs,
          carry = Seq("event_id"),
          chunkMs = chunk)
          // consume the window outputs: a bare count() lets column pruning
          // DELETE the Window operator (nothing downstream reads it) and
          // the probe would time the scan, not the windows
          .agg(sum(col("value_past")), count(lit(1))).collect()(0).getLong(1)
      if (forms("unchunked"))
        emit(label, "rolling_examples_unchunked", timeOp(repeats)(rolling(0)))
      if (forms("chunk"))
        emit(label, "rolling_examples_chunk7d", timeOp(repeats)(
          rolling(7L * 24 * 3600 * 1000)))
    }
    val skewPcts = sys.env.getOrElse("SPARK_GRAFT_SKEW_PCTS", "30,90")
      .split(",").map(_.trim.toInt).toSeq
    // set membership over the split list, NOT substring contains —
    // "unchunked".contains("chunk") would make the forms inseparable
    val skewForms = sys.env.getOrElse("SPARK_GRAFT_SKEW_FORMS", "unchunked,chunk")
      .split(",").map(_.trim).toSet
    for (megaPct <- skewPcts if sections("skew"))
      skewProbe(10, megaPct, s"10x_skew$megaPct", skewForms)

    // The crossover case: a mega-entity whose history alone dominates one
    // task — 100x events (10M rows), 90% in one entity (9M). The corpus
    // spans 30 days, so chunk=7d caps per-task history at ~1/5 + halo.
    if (sys.env.get("SPARK_GRAFT_SKEW100").contains("1"))
      skewProbe(100, 90, "100x_skew90", skewForms)

    println(s"""{"probe":"r13_scale","load_end":${loadAvg()}}""")
    spark.stop()
  }
}
