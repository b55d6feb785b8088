package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale measurements for the round-16 batch (same protocol as
  * [[R15bScaleProbe]]: min/median wall seconds over repeats; documents /
  * embeddings 1× = sf0.1 vs 10× = the ScaleGen vocabulary-disjoint twin):
  *
  *  - `ann_radius_brute` vs `ann_radius_ivf`: the round's headline — the
  *    brute radius scan is corpus-linear; the cell-pruned radius serves
  *    from an AT-REST index (written to parquet outside the timer, the
  *    deployment shape) and scans only the probed cells. nlist=64 /
  *    nprobe sweep 2/8/64 at 10× shows the pruning dial and the
  *    exact-at-nlist ceiling.
  *  - `intervals_all_of_any`: the unordered all_of fold — row-local HOF
  *    behind the codegen'd contains guard, expected flat-ish like the
  *    rest of the proximity family.
  *  - `termvectors_flat` / `highlight_frag_explode`: the comparator-safe
  *    result shapes (one explode / one array_join on top of the r15
  *    kernels — the reshape must not change the scaling class).
  *
  * Usage: `runMain graft.tools.R16ScaleProbe [repeats=3]`.
  */
object R16ScaleProbe {

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
      .appName("graft-r16-scale-probe")
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(s"""{"probe":"r16_scale","load_start":${loadAvg()}}""")

    def emit(op: String, r: (Double, Double, Long)): Unit =
      println(s"""{"probe":"r16_scale","op":"$op",""" +
        s""""min":${math.round(r._1 * 1000) / 1000.0},""" +
        s""""median":${math.round(r._2 * 1000) / 1000.0},"rows":${r._3}}""")

    val sf1 = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val twin = sys.env.getOrElse("SPARK_GRAFT_TWIN_DIR", "/tmp/graft_sf1")

    import graft.query.FilterSpec
    import graft.ops.Similarity

    for ((label, dir) <- Seq("1x" -> sf1, "10x" -> twin)) {
      val d = spark.read.parquet(s"$dir/documents.parquet")
      emit(s"intervals_all_of_any_$label", timeOp(repeats) {
        d.where(FilterSpec.IntervalsAllOf("text",
          Seq(Seq("spark"), Seq("batch scan")), maxGaps = 2,
          ordered = false).compile).count()
      })
      emit(s"termvectors_flat_$label", timeOp(repeats) {
        graft.query.TermVectors.termVectorsFlat(
          d.where(col("doc_id") < 12), "doc_id", "text").count()
      })
      emit(s"highlight_frag_explode_$label", timeOp(repeats) {
        val frags = graft.expr.TextMatch.highlightFragments(
          col("text"), "dup vector", fragmentSize = 60, numberOfFragments = 2)
        d.select(col("doc_id"), posexplode(frags).as(Seq("r", "f"))).count()
      })

      emit(s"sparse_vector_topk_$label", timeOp(repeats) {
        val postings = graft.query.SparseVector.tfPostings(d, "doc_id", "text")
        graft.query.SparseVector.topK(postings, "doc_id",
          Seq("vector" -> 2.0, "dup" -> 1.5, "scan" -> 0.5), k = 15).count()
      })
      // the at-rest bucketed layout: postings written partitionBy once
      // (outside the timer — index maintenance), serving reads with the
      // static bucket partition filter
      val pPath = s"/tmp/graft_r16_sv_postings_$label"
      graft.query.SparseVector.tfPostingsBucketed(d, "doc_id", "text", 64)
        .write.mode("overwrite").partitionBy("term_bucket").parquet(pPath)
      emit(s"sparse_vector_atrest_$label", timeOp(repeats) {
        graft.query.SparseVector.topK(spark.read.parquet(pPath), "doc_id",
          Seq("vector" -> 2.0, "dup" -> 1.5, "scan" -> 0.5), k = 15,
          numBuckets = 64).count()
      })

      val e = spark.read.parquet(s"$dir/embeddings.parquet")
      val q = e.where(col("vec_id") < 5)
      emit(s"matryoshka_ladder_$label", timeOp(repeats) {
        graft.ops.Similarity.matryoshkaRecallReport(e, "vec_id", "embedding",
          q, "vec_id", "embedding", k = 10, dims = Seq(8, 16, 32, 64)).count()
      })
      emit(s"ann_radius_brute_$label", timeOp(repeats) {
        Similarity.bruteForceRadius(e, "vec_id", "embedding",
          q, "vec_id", "embedding", 0.30).count()
      })
      // The at-rest index build happens OUTSIDE the serving timer — that
      // is the premise of the cell-pruned path (assignCells is the
      // maintenance half; serving reads the stored (vec_id, vec, cell)).
      val cents = Similarity.kmeansCentroids(e, "vec_id", "embedding",
        k = 64, iters = 0)
      val idxPath = s"/tmp/graft_r16_ivf_idx_$label"
      Similarity.assignCells(e, "vec_id", "embedding", cents)
        .write.mode("overwrite").parquet(idxPath)
      val index = spark.read.parquet(idxPath)
      for (np <- Seq(2, 8, 64)) {
        emit(s"ann_radius_ivf_np${np}_$label", timeOp(repeats) {
          Similarity.ivfRadius(index, cents, q, "vec_id", "embedding",
            0.30, nprobe = np).count()
        })
      }
    }

    println(s"""{"probe":"r16_scale","load_end":${loadAvg()}}""")
    spark.stop()
  }
}
