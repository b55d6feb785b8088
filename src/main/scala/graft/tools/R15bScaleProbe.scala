package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale measurements for the round-15 second wave (same protocol as
  * [[R15ScaleProbe]]: min/median wall seconds over repeats):
  *
  *  - `span_first` / `span_not` / `intervals_not_containing`: row-local
  *    position predicates behind codegen'd substring guards — documents
  *    1× = sf0.1 vs 10× = the ScaleGen twin.
  *  - `nested_query`: one collect_list hash aggregate (bounded by
  *    items-per-order) + one keyed join — lineitem/orders sf0.01 vs
  *    sf0.1 (the twin has no TPC-H tables).
  *  - `geo_box` / `geo_distance_filter`: pure-comparison / fixed-trig
  *    row-local filters — customer sf0.01 vs sf0.1.
  *  - `ann_radius`: broadcast-query brute cosine threshold — embeddings
  *    sf0.1 vs the twin (corpus-side linear, no shuffle, no window).
  *  - `cluster_safe_split`: banded MinHash pairs → components → one
  *    left join + row-local label fold — documents sf0.1 vs the twin.
  *
  * Usage: `runMain graft.tools.R15bScaleProbe [repeats=3]`.
  */
object R15bScaleProbe {

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
      .appName("graft-r15b-scale-probe")
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(s"""{"probe":"r15b_scale","load_start":${loadAvg()}}""")

    def emit(op: String, r: (Double, Double, Long)): Unit =
      println(s"""{"probe":"r15b_scale","op":"$op",""" +
        s""""min":${math.round(r._1 * 1000) / 1000.0},""" +
        s""""median":${math.round(r._2 * 1000) / 1000.0},"rows":${r._3}}""")

    val sf01 = "/root/testdata/sf0.01"
    val sf1 = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val twin = sys.env.getOrElse("SPARK_GRAFT_TWIN_DIR", "/tmp/graft_sf1")

    import graft.query.FilterSpec
    import graft.ops.{Dedup, Sampling, Similarity}

    // ---- document-corpus ops: sf0.1 vs the 10x twin ----
    for ((label, dir) <- Seq("1x" -> sf1, "10x" -> twin)) {
      val d = spark.read.parquet(s"$dir/documents.parquet")
      emit(s"span_first_$label", timeOp(repeats) {
        d.where(FilterSpec.SpanFirst("text", "spark", end = 6).compile).count()
      })
      emit(s"span_not_$label", timeOp(repeats) {
        d.where(FilterSpec.SpanNot("text", "scan", "vector scan").compile).count()
      })
      emit(s"intervals_not_containing_$label", timeOp(repeats) {
        d.where(FilterSpec.IntervalsFiltered("text", "spark scan", 5,
          "not_containing", "vector").compile).count()
      })
      emit(s"cluster_safe_split_$label", timeOp(repeats) {
        val pairs = Dedup.minhashNearDupPairs(d, "doc_id", "text",
          threshold = 0.4, shingleK = 2, numBands = 16, rowsPerBand = 2)
        Sampling.clusterSafeSplit(d, "doc_id", pairs,
            Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125))
          .groupBy("split").count().collect().map(_.getLong(1)).sum
      })
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
      emit(s"ann_radius_$label", timeOp(repeats) {
        Similarity.bruteForceRadius(e, "vec_id", "embedding",
          e.where(col("vec_id") < 5), "vec_id", "embedding", 0.30).count()
      })
    }

    // ---- TPC-H-table ops: sf0.01 vs sf0.1 (no twin tables) ----
    for ((label, dir) <- Seq("1x" -> sf01, "10x" -> sf1)) {
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
      val ord = spark.read.parquet(s"$dir/orders.parquet")
      emit(s"nested_query_$label", timeOp(repeats) {
        val items = graft.query.NestedDocs.nest(li, "l_orderkey",
          Seq("l_quantity", "l_discount"))
        val flagged = items.select(col("l_orderkey"),
          graft.query.NestedDocs.nestedMatch(col("items"),
            it => it("l_quantity") >= 45 && it("l_discount") >= 0.08).as("_n"))
        ord.join(flagged, col("o_orderkey") === col("l_orderkey"), "left")
          .groupBy("o_orderpriority")
          .agg(sum(when(coalesce(col("_n"), lit(false)), 1).otherwise(0)).as("n"))
          .count()
      })
      val cust = spark.read.parquet(s"$dir/customer.parquet")
        .withColumn("lat", pmod(col("c_acctbal"), lit(180)) - 90 + lit(0.001))
        .withColumn("lon", pmod(col("c_custkey"), lit(360)) - 180 + lit(0.001))
      emit(s"geo_box_$label", timeOp(repeats) {
        cust.where(FilterSpec.GeoBoundingBox("lat", "lon",
          60.0, 150.0, -10.0, -120.0).compile).count()
      })
      emit(s"geo_distance_filter_$label", timeOp(repeats) {
        cust.where(FilterSpec.GeoDistance("lat", "lon",
          10.0, 20.0, 3000.0).compile).count()
      })
    }

    println(s"""{"probe":"r15b_scale","load_end":${loadAvg()}}""")
    spark.stop()
  }
}
