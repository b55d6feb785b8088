package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale measurements for round-17's second wave (protocol of
  * [[R17ScaleProbe]]: min/median wall seconds over repeats):
  *
  *  - **documents-shaped ops** at 1× = sf0.1 vs 10× = the ScaleGen
  *    vocabulary-disjoint twin: the span_within enclosure predicate, the
  *    predicate-source intervals pattern, and the FULL frequent_item_sets
  *    Apriori run (its per-level counting joins are where corpus scale
  *    lands; candidate generation is driver-side and corpus-invariant).
  *  - **categorizeTextMerged** over a synthetic log corpus derived from
  *    the same documents tables (doc_id-seeded templates → a bounded
  *    category table), so the corpus scan scales 10× while the category
  *    graph stays template-shaped — the separation the op's design
  *    claims.
  *  - **join-field ops** over orders/lineitem at sf0.01 vs sf0.1 (the
  *    TPC-H tables' own 10× step): has_child default (pure semi-join) and
  *    count-bounded, has_parent, children agg.
  *
  * Usage: `runMain graft.tools.R17bScaleProbe [repeats=3]`.
  */
object R17bScaleProbe {

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
      .appName("graft-r17b-scale-probe")
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(s"""{"probe":"r17b_scale","load_start":${loadAvg()}}""")

    def emit(op: String, r: (Double, Double, Long)): Unit =
      println(s"""{"probe":"r17b_scale","op":"$op",""" +
        s""""min":${math.round(r._1 * 1000) / 1000.0},""" +
        s""""median":${math.round(r._2 * 1000) / 1000.0},"rows":${r._3}}""")

    val sf1 = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val twin = sys.env.getOrElse("SPARK_GRAFT_TWIN_DIR", "/tmp/graft_sf1")

    for ((label, dir) <- Seq("1x" -> sf1, "10x" -> twin)) {
      val d = spark.read.parquet(s"$dir/documents.parquet")

      emit(s"span_within_$label", timeOp(repeats) {
        d.where(graft.query.FilterSpec.SpanWithin("text",
          little = "key", big = Seq("scan", "table"), slop = 3).compile).count()
      })
      emit(s"intervals_pattern_$label", timeOp(repeats) {
        import graft.query.FilterSpec.IntervalSource.{Fuzzy, Prefix}
        d.where(graft.query.FilterSpec.IntervalsPattern("text",
          Seq(Prefix("sca"), Fuzzy("tabel", 1)), maxGaps = 3).compile).count()
      })
      // frequent_item_sets needs the LIGHT twin at 10× — the disjoint
      // twin's full token mutation empties the basket's supports, which
      // would time a degenerate L1-empty run
      val fisDir = if (label == "10x")
        sys.env.getOrElse("SPARK_GRAFT_TWIN_LIGHT_DIR", "/tmp/graft_sf1_light")
      else dir
      val fisDocs = spark.read.parquet(s"$fisDir/documents.parquet")
      val basket = Seq("scan", "join", "hash", "merge", "sort", "filter",
        "agg", "batch", "window", "index", "table", "key")
      emit(s"frequent_item_sets_$label", timeOp(repeats) {
        val items = array_intersect(
          split(trim(graft.expr.TextMatch.normalized(col("text"))), " "),
          array(basket.map(lit): _*))
        graft.query.Aggs.frequentItemSets(
          fisDocs.select(col("doc_id"), items.as("items")),
          col("doc_id"), col("items"),
          minSupport = 0.45, minSetSize = 2, size = 10, maxSetSize = 6).count()
      })
      // synthetic log corpus: doc_id-seeded templates, category table
      // bounded at ~18 templates regardless of corpus size
      val queues = array(Seq("alpha", "beta", "gamma", "delta", "epsilon",
        "zeta", "eta", "theta").map(lit): _*)
      val logs = d.select(col("doc_id"),
        when(pmod(col("doc_id"), lit(2)) === 0,
          concat(lit("worker "), element_at(queues, (pmod(col("doc_id"), lit(8)) + 1).cast("int")),
            lit(" task "), col("doc_id").cast("string"), lit(" finished")))
          .otherwise(concat(lit("queue "),
            element_at(queues, (pmod(col("doc_id"), lit(8)) + 1).cast("int")),
            lit(" depth "), pmod(col("doc_id"), lit(97)).cast("string"),
            lit(" exceeded limit"))).as("msg"))
      emit(s"categorize_merged_$label", timeOp(repeats) {
        graft.query.Aggs.categorizeTextMerged(logs, "doc_id", "msg",
          threshold = 0.5, n = 20).count()
      })
    }

    for ((label, dir) <- Seq("sf0.01" -> "/root/testdata/sf0.01",
        "sf0.1" -> "/root/testdata/sf0.1")) {
      val orders = spark.read.parquet(s"$dir/orders.parquet")
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
      emit(s"has_child_semi_$label", timeOp(repeats) {
        graft.query.JoinField.hasChild(orders, li, "o_orderkey", "l_orderkey",
          col("l_quantity") >= 49).count()
      })
      emit(s"has_child_bounded_$label", timeOp(repeats) {
        graft.query.JoinField.hasChild(orders, li, "o_orderkey", "l_orderkey",
          col("l_quantity") >= 49, minChildren = 2).count()
      })
      emit(s"has_parent_$label", timeOp(repeats) {
        graft.query.JoinField.hasParent(orders, li, "o_orderkey", "l_orderkey",
          col("o_orderpriority") === "1-URGENT" && col("o_totalprice") >= 250000).count()
      })
      emit(s"children_agg_$label", timeOp(repeats) {
        graft.query.JoinField.childrenAgg(orders, li, "o_orderkey",
          "l_orderkey", "o_orderpriority",
          Seq(sum(col("l_quantity")).cast("long").as("sum_qty"))).count()
      })
    }

    println(s"""{"probe":"r17b_scale","load_end":${loadAvg()}}""")
    spark.stop()
  }
}
