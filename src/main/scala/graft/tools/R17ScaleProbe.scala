package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale measurements for the round-17 batch (protocol of
  * [[R16ScaleProbe]]: min/median wall seconds over repeats; documents /
  * embeddings 1× = sf0.1 vs 10× = the ScaleGen vocabulary-disjoint twin):
  *
  *  - **Compaction payoff** (the round's headline — round-16 verdict #1):
  *    a postings / IVF increment table is churned through E epochs of
  *    re-emitted slices plus a replayed epoch, then the SERVE-VIEW build
  *    (`postingsFromIncrements → score` / `ivfIndexFromIncrements →
  *    ivfTopKFromIndex`) is timed against the full epoch history vs the
  *    compacted table, with row counts recording what compaction folded
  *    away. The serve view is where the uncompacted cost lives: its
  *    per-doc/per-vec window shuffles the WHOLE history per rebuild.
  *  - `intervals_all_of_mixed`: the new minimal-interval unordered
  *    pipeline (5-level HOF let-binding + quadratic candidate scans) —
  *    expected flat-ish like the proximity family, being row-local
  *    behind the codegen'd contains guard.
  *  - `sparse_vector` pruned vs unpruned serving at both scales (the
  *    prune decision itself costs one df aggregate here; a deployment
  *    serves it from the maintained gram-df artifact).
  *
  * Usage: `runMain graft.tools.R17ScaleProbe [repeats=3]`.
  */
object R17ScaleProbe {

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
      .appName("graft-r17-scale-probe")
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(s"""{"probe":"r17_scale","load_start":${loadAvg()}}""")

    def emit(op: String, r: (Double, Double, Long)): Unit =
      println(s"""{"probe":"r17_scale","op":"$op",""" +
        s""""min":${math.round(r._1 * 1000) / 1000.0},""" +
        s""""median":${math.round(r._2 * 1000) / 1000.0},"rows":${r._3}}""")

    val sf1 = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val twin = sys.env.getOrElse("SPARK_GRAFT_TWIN_DIR", "/tmp/graft_sf1")
    val q = Seq("vector" -> 2.0, "dup" -> 1.5, "scan" -> 0.5)

    for ((label, dir) <- Seq("1x" -> sf1, "10x" -> twin)) {
      val d = spark.read.parquet(s"$dir/documents.parquet")

      // -- compaction payoff: postings increments churned over E epochs.
      // Epoch e re-emits the (doc_id % 4 == e % 4) slice — every doc
      // updated 4 times over 16 epochs — and epoch 0 appends twice (the
      // at-least-once replay). Outside the timers: this is maintenance.
      val pPath = s"/tmp/graft_r17_postings_$label"
      graft.store.FsOps.fileSystem(spark, pPath)
        .delete(new org.apache.hadoop.fs.Path(pPath), true)
      val epochs = 16
      (0 until epochs).foreach { ep =>
        graft.query.SparseVector.tfPostingsBucketed(
            d.where(pmod(col("doc_id"), lit(4)) === ep % 4),
            "doc_id", "text", numBuckets = 64)
          .withColumn("inc_batch_id", lit(ep.toLong))
          .write.mode("append").partitionBy("term_bucket").parquet(pPath)
      }
      val replay = spark.read.parquet(pPath).where(col("inc_batch_id") === 0L)
      replay.write.mode("append").partitionBy("term_bucket").parquet(pPath)
      val rawRows = spark.read.parquet(pPath).count()
      emit(s"postings_serve_uncompacted_$label", timeOp(repeats) {
        graft.query.SparseVector.score(
          graft.streaming.EventStreams.postingsFromIncrements(spark, "doc_id", pPath),
          "doc_id", q, numBuckets = 64).count()
      })
      val t0 = System.nanoTime()
      graft.streaming.EventStreams.compactPostingsIncrements(spark, "doc_id", pPath)
      val compactSecs = (System.nanoTime() - t0) / 1e9
      val liveRows = spark.read.parquet(pPath).count()
      println(s"""{"probe":"r17_scale","op":"postings_compact_$label",""" +
        s""""secs":${math.round(compactSecs * 1000) / 1000.0},""" +
        s""""raw_rows":$rawRows,"live_rows":$liveRows}""")
      emit(s"postings_serve_compacted_$label", timeOp(repeats) {
        graft.query.SparseVector.score(
          graft.streaming.EventStreams.postingsFromIncrements(spark, "doc_id", pPath),
          "doc_id", q, numBuckets = 64).count()
      })

      // -- the same story for the IVF index: every vector re-assigned
      // across 8 epochs (quarter-slices), epoch 0 replayed.
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
      val cents = graft.ops.Similarity.kmeansCentroids(
        e, "vec_id", "embedding", k = 64, iters = 0)
      val iPath = s"/tmp/graft_r17_ivf_$label"
      graft.store.FsOps.fileSystem(spark, iPath)
        .delete(new org.apache.hadoop.fs.Path(iPath), true)
      (0 until 8).foreach { ep =>
        graft.ops.Similarity.assignCells(
            e.where(pmod(col("vec_id"), lit(4)) === ep % 4),
            "vec_id", "embedding", cents)
          .withColumn("inc_batch_id", lit(ep.toLong))
          .write.mode("append").partitionBy("cell").parquet(iPath)
      }
      spark.read.parquet(iPath).where(col("inc_batch_id") === 0L)
        .write.mode("append").partitionBy("cell").parquet(iPath)
      val iRaw = spark.read.parquet(iPath).count()
      val qv = e.where(col("vec_id") < 5)
      emit(s"ivf_serve_uncompacted_$label", timeOp(repeats) {
        graft.ops.Similarity.ivfTopKFromIndex(
          graft.streaming.EventStreams.ivfIndexFromIncrements(spark, iPath),
          cents, qv, "vec_id", "embedding", k = 10, nprobe = 8).count()
      })
      val t1 = System.nanoTime()
      graft.streaming.EventStreams.compactIvfIndexIncrements(spark, iPath)
      val iCompactSecs = (System.nanoTime() - t1) / 1e9
      val iLive = spark.read.parquet(iPath).count()
      println(s"""{"probe":"r17_scale","op":"ivf_compact_$label",""" +
        s""""secs":${math.round(iCompactSecs * 1000) / 1000.0},""" +
        s""""raw_rows":$iRaw,"live_rows":$iLive}""")
      emit(s"ivf_serve_compacted_$label", timeOp(repeats) {
        graft.ops.Similarity.ivfTopKFromIndex(
          graft.streaming.EventStreams.ivfIndexFromIncrements(spark, iPath),
          cents, qv, "vec_id", "embedding", k = 10, nprobe = 8).count()
      })

      // -- the minimal-interval unordered pipeline on mixed-length slots
      emit(s"intervals_all_of_mixed_$label", timeOp(repeats) {
        d.where(graft.query.FilterSpec.IntervalsAllOf("text",
          Seq(Seq("scan", "batch scan"), Seq("merge")), maxGaps = 0,
          ordered = false).compile).count()
      })

      // -- pruned vs unpruned sparse serving (prune includes its df scan)
      val postings = graft.query.SparseVector.tfPostings(d, "doc_id", "text")
      val wide = Seq("vector" -> 2.0, "dup" -> 0.5, "scan" -> 0.3, "merge" -> 0.25)
      emit(s"sparse_unpruned_$label", timeOp(repeats) {
        graft.query.SparseVector.topK(postings, "doc_id", wide, k = 15).count()
      })
      emit(s"sparse_pruned_$label", timeOp(repeats) {
        val kept = graft.query.SparseVector.prune(postings, wide,
          freqRatioThreshold = 1.0, weightThreshold = 0.4)
        graft.query.SparseVector.topK(postings, "doc_id", kept, k = 15).count()
      })
    }

    println(s"""{"probe":"r17_scale","load_end":${loadAvg()}}""")
    spark.stop()
  }
}
