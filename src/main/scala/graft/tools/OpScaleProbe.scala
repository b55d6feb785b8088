package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** 10× scale measurements for the round-12 operators (the same protocol as
  * SCALE_r11's pipeline table): run each operator over sf0.1 and the
  * ScaleGen 10× disjoint twin and record min/median wall seconds.
  *
  *  - `gopher_profile` — one row-local codegen'd scan (PlanSpec-pinned
  *    exchange-free): must scale with scan volume, i.e. ≲linear.
  *  - `importance_scores` — one corpus exchange (1024-bucket model) +
  *    broadcast scoring join + doc-id aggregation: ≲linear.
  *  - `semdedup_pairs` — Σ|cell|² candidate volume. The probe scales
  *    `nlist` WITH the corpus (8 at 5k vectors → 80 at 50k, the √N-free
  *    "keep E|cell| constant" sizing the operator's scaladoc prescribes),
  *    which holds candidate volume linear in rows; it also records the
  *    candidate count so the linearity is verified structurally, not just
  *    by wall clock.
  *
  * Usage: `runMain graft.tools.OpScaleProbe [repeats=3]` after ScaleGen
  * has produced `/tmp/graft_sf1`. Emits one JSON line per measurement.
  */
object OpScaleProbe {

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
      .appName("graft-op-scale-probe")
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(s"""{"probe":"op_scale","load_start":${loadAvg()}}""")

    val scales = Seq(
      ("1x", "/root/testdata/sf0.1", 8),
      ("10x", "/tmp/graft_sf1", 80))
    for ((label, dir, nlist) <- scales) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      docs.count() // touch files outside the timed window
      def emit(op: String, r: (Double, Double, Long)): Unit =
        println(s"""{"probe":"op_scale","scale":"$label","op":"$op",""" +
          s""""min_s":${math.round(r._1 * 1000) / 1000.0},""" +
          s""""med_s":${math.round(r._2 * 1000) / 1000.0},"rows":${r._3}}""")

      emit("gopher_profile", timeOp(repeats) {
        graft.ops.TextAnalysis.gopherProfile(docs, "text")
          .groupBy("gopher_pass").count().collect().map(_.getLong(1)).sum
      })
      emit("importance_scores", timeOp(repeats) {
        graft.ops.Sampling.importanceScores(docs, "doc_id", "text",
          targetCond = col("lang") === "en")
          .agg(count(lit(1)), sum("bits")).collect()(0).getLong(0)
      })

      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      emb.count()
      emit(s"semdedup_pairs_nlist$nlist", timeOp(repeats) {
        graft.ops.Similarity.semanticNearDupPairs(emb, "vec_id", "embedding",
          threshold = 0.42, nlist = nlist).count()
      })

      // events twin for the example assembler (ServeScaleProbe's
      // construction: remapped event/user ids, unchanged ts/type/value —
      // per-user history identical per copy, so the per-entity window
      // cost is constant and the total must scale with rows)
      val evPath =
        if (label == "1x") "/root/testdata/sf0.1/events.parquet"
        else {
          val p = s"/tmp/graft_events_probe10/events.parquet"
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
        .withColumn("ts", col("ts").cast("timestamp"))
      ev.count()
      emit("rolling_examples", timeOp(repeats) {
        graft.ops.Features.rollingExamples(ev, "user_id", "ts",
          anchorCond = col("event_type") === "click",
          outcomeCond = col("event_type") === "purchase",
          valueCol = floor(col("value") * 100),
          featureWindowMs = 7L * 24 * 3600 * 1000,
          labelWindowMs = 3L * 24 * 3600 * 1000,
          carry = Seq("event_id")).count()
      })
    }
    println(s"""{"probe":"op_scale","load_end":${loadAvg()}}""")
    spark.stop()
  }
}
