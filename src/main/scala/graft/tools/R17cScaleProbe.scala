package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Round-17 third wave: the ES|QL front-end under the standard protocol
  * (min/median wall seconds over repeats at sf0.01 vs sf0.1 — the TPC-H
  * tables' own 10× step) PLUS a physical-plan audit: for each registered
  * esql_* query the probe asserts the plan property the compiler
  * promises (scan pushdown, schema pruning, top-K fusion, broadcast
  * joins, window-not-join for INLINESTATS) and prints the verdicts as
  * one JSON line each. Parse cost is also isolated (parse-only repeats
  * over the program text) to show the front-end adds driver-side
  * microseconds, not plan-time structure.
  *
  * Usage: `runMain graft.tools.R17cScaleProbe [repeats=3]`.
  */
object R17cScaleProbe {

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

  /** (name, plan predicate description, predicate). */
  private val planPins: Seq[(String, String, String => Boolean)] = Seq(
    ("esql_stats", "filter pushed to scan + hash agg",
      p => p.contains("PushedFilters: [IsNotNull(l_shipdate)") && p.contains("HashAggregate")),
    ("esql_topk", "TakeOrderedAndProject + pruned ReadSchema",
      p => p.contains("TakeOrderedAndProject") &&
        p.contains("ReadSchema: struct<doc_id:bigint,text") == false &&
        p.contains("lang:string")),
    ("esql_wordcount", "explode -> hash agg -> top-K (no global sort)",
      p => p.contains("Generate explode") && p.contains("HashAggregate") &&
        p.contains("TakeOrderedAndProject")),
    ("esql_enrich", "broadcast join against the policy table",
      p => p.contains("BroadcastHashJoin")),
    ("esql_lookup_join", "broadcast join against the lookup index",
      p => p.contains("BroadcastHashJoin")),
    ("esql_inlinestats", "window aggregate, no self-join",
      p => p.contains("Window") && !p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin")),
    ("esql_fork_fuse", "per-branch top-K under one union",
      p => p.contains("TakeOrderedAndProject") && p.contains("Union")),
    ("esql_sample", "keyed-hash filter above an unfiltered scan (derived filters cannot push)",
      p => p.contains("md5") && p.contains("HashAggregate")))

  def main(args: Array[String]): Unit = {
    val repeats = if (args.nonEmpty) args(0).toInt else 3
    val spark = SparkSession.builder()
      .appName("graft-r17c-scale-probe")
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(s"""{"probe":"r17c_esql","load_start":${loadAvg()}}""")

    val names = graft.SparkEntry.queries.keys.filter(_.startsWith("esql_")).toSeq.sorted

    // plan audit at sf0.01 (plan SHAPE is sf-invariant; pins must hold)
    planPins.foreach { case (name, what, ok) =>
      val df: DataFrame = graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.01")
      val plan = df.queryExecution.executedPlan.toString
      val verdict = ok(plan)
      println(s"""{"plan":"$name","pin":"$what","holds":$verdict}""")
      assert(verdict, s"plan pin failed for $name:\n$plan")
    }

    // timing: each esql query at both scales
    Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1").foreach { dir =>
      names.foreach { name =>
        val (mn, md, rows) = timeOp(repeats) {
          graft.SparkEntry.queries(name)(spark, dir).count()
        }
        println(f"""{"q":"$name","sf":"${dir.split('/').last}","min":$mn%.3f,"med":$md%.3f,"rows":$rows}""")
      }
    }

    // parse+compile cost in isolation (Esql.column, the public
    // expression entry): the front-end's driver-side overhead per call
    val expression = """n_chars / 100.0 + CASE(lang == "en", 1, 0) * ROUND(2.5, 0)"""
    val t0 = System.nanoTime()
    var i = 0
    while (i < 10000) { graft.query.Esql.column(expression); i += 1 }
    val usPerParse = (System.nanoTime() - t0) / 1e3 / 10000
    println(f"""{"expr_compile_us":$usPerParse%.1f,"load_end":${loadAvg()}%.2f}""")
    spark.stop()
  }
}
