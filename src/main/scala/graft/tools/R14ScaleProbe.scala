package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.query.Percolator

/** Scale measurements for the round-14 changes, same protocol as
  * [[OpScaleProbe]]/[[R13ScaleProbe]] (min/median wall seconds over
  * repeats):
  *
  *  - `percolate_10k`: 10,000 stored queries over the sf0.1 documents
  *    corpus — the single-plan form (all 10k predicates in one projection;
  *    whole-stage codegen falls back past its method budget and the
  *    driver pays a 10k-column analysis) versus `percolateSharded` at
  *    1024 queries per plan (every shard codegen'd, ⌈n/1024⌉ scans).
  *    Parity of the two result sets is asserted, not assumed.
  *
  * Usage: `runMain graft.tools.R14ScaleProbe [repeats=3]`. Emits one JSON
  * line per measurement.
  */
object R14ScaleProbe {

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
    val repeats = if (args.nonEmpty) args(0).toInt else 1
    val spark = SparkSession.builder()
      .appName("graft-r14-scale-probe")
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(s"""{"probe":"r14_scale","load_start":${loadAvg()}}""")

    def emit(op: String, r: (Double, Double, Long)): Unit =
      println(s"""{"probe":"r14_scale","op":"$op",""" +
        s""""min":${math.round(r._1 * 1000) / 1000.0},""" +
        s""""median":${math.round(r._2 * 1000) / 1000.0},"rows":${r._3}}""")

    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    // 10k stored queries drawn from the corpus vocabulary so a realistic
    // fraction actually match: analyzed terms, fuzzy, prefixes, ranges.
    val terms = Seq("dup", "vector", "scan", "table", "merge", "batch",
      "spark", "row", "group", "filter", "key", "agg", "hash", "value")
    val stored = Percolator.fromStrings(
      (0 until 10000).map { i =>
        val t = terms(i % terms.length)
        val q = (i / terms.length) % 4 match {
          case 0 => s"text:$t"
          case 1 => s"text:$t*"
          case 2 => s"lang:en AND text:$t"
          case 3 => s"n_chars:[${100 + (i % 700)} TO *] AND text:$t"
        }
        (s"alert_$i", q)
      },
      defaultField = "text")

    System.err.println("[r14probe] timing sharded(1024)...")
    val sharded = timeOp(repeats) {
      Percolator.percolateSharded(docs, "doc_id", stored, maxQueriesPerPlan = 1024)
        .count()
    }
    emit("percolate_10k_sharded_1024", sharded)

    System.err.println("[r14probe] timing single plan (10k predicates, 1 pass)...")
    val onePlan = timeOp(1) {
      Percolator.percolateLong(docs, "doc_id", stored).count()
    }
    emit("percolate_10k_single_plan", onePlan)

    require(sharded._3 == onePlan._3,
      s"parity violated: sharded=${sharded._3} single=${onePlan._3}")
    println(s"""{"probe":"r14_scale","op":"percolate_10k_parity","rows":${sharded._3}}""")

    spark.stop()
  }
}
