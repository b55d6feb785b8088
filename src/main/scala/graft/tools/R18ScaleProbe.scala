package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Round-18 probe: the new front-end surfaces (QSTR/KQL in ES|QL, TS +
  * RATE, FUSE linear, multi-field fields^boost grammars, the INLINESTATS
  * rewrite) under the standard protocol — min/median wall seconds over
  * repeats at sf0.01 vs sf0.1 — plus a physical-plan audit asserting the
  * property each compiler promises (pushdown through the new grammars,
  * pruning, no unpartitioned window anywhere, broadcast join-backs).
  *
  * Usage: `runMain graft.tools.R18ScaleProbe [repeats=3]`.
  */
object R18ScaleProbe {

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

  /** (name, plan pin description, predicate). */
  private val planPins: Seq[(String, String, String => Boolean)] = Seq(
    ("esql_qstr", "schema pruned past the QSTR front-end (no n_chars read) + hash agg",
      p => p.contains("HashAggregate") && !p.contains("n_chars")),
    ("esql_kql", "KQL range comparison pushed to the parquet scan",
      p => p.contains("GreaterThanOrEqual(n_chars,200)")),
    ("esql_ts_rate", "one series window + hash agg, no join",
      p => p.contains("Window") && p.contains("HashAggregate") &&
        !p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin")),
    ("esql_fork_fuse_linear", "per-branch top-K, fork-partitioned minmax window, no sort-merge join",
      p => p.contains("TakeOrderedAndProject") && p.contains("Union") &&
        p.contains("Window") && !p.contains("SortMergeJoin")),
    ("q_simple_query_string_fields", "per-field runs full-outer joined, top-K fused",
      p => p.contains("FullOuter") && p.contains("TakeOrderedAndProject")),
    ("q_query_string_fields", "schema pruned past the multi-field grammar (no n_chars read)",
      p => !p.contains("n_chars")),
    ("q_parent_id", "the literal parent key pushed to the scan",
      p => p.contains("EqualTo(l_orderkey,7)")))

  def main(args: Array[String]): Unit = {
    val repeats = if (args.nonEmpty) args(0).toInt else 3
    val spark = SparkSession.builder()
      .appName("graft-r18-scale-probe")
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(s"""{"probe":"r18","load_start":${loadAvg()}}""")

    // plan audit at sf0.01 (plan SHAPE is sf-invariant)
    planPins.foreach { case (name, what, ok) =>
      val df: DataFrame = graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.01")
      val plan = df.queryExecution.executedPlan.toString
      val verdict = ok(plan)
      println(s"""{"plan":"$name","pin":"$what","holds":$verdict}""")
      assert(verdict, s"plan pin failed for $name:\n$plan")
    }

    // the INLINESTATS rewrite shapes (no committed query carries them —
    // the round-17 verdict's wrong #1 closed): no-BY must broadcast a
    // 1-row aggregate, ordered-set must join back, NEITHER may window
    // globally
    def docs(dir: String) = spark.read.parquet(s"$dir/documents.parquet")
    val noBy = graft.query.Esql.run(
      "FROM d | INLINESTATS m = MAX(n_chars) | WHERE n_chars == m | KEEP doc_id",
      _ => docs("/root/testdata/sf0.01"))
    val noByPlan = noBy.queryExecution.executedPlan.toString
    val noByOk = !noByPlan.contains("Window") && noByPlan.contains("BroadcastExchange")
    println(s"""{"plan":"inlinestats_no_by","pin":"broadcast 1-row agg, no window","holds":$noByOk}""")
    assert(noByOk, noByPlan)
    val ordered = graft.query.Esql.run(
      "FROM d | INLINESTATS med = MEDIAN(n_chars) BY lang | WHERE n_chars > med | STATS n = COUNT(*) BY lang | SORT lang",
      _ => docs("/root/testdata/sf0.01"))
    val orderedPlan = ordered.queryExecution.executedPlan.toString
    val orderedOk = !orderedPlan.contains("Window") && orderedPlan.contains("BroadcastHashJoin")
    println(s"""{"plan":"inlinestats_ordered_set","pin":"STATS + broadcast join-back, no window","holds":$orderedOk}""")
    assert(orderedOk, orderedPlan)

    // timings: the round-18 queries at both scales
    val names = Seq("esql_qstr", "esql_kql", "esql_ts_rate",
      "esql_fork_fuse_linear", "q_simple_query_string_fields",
      "q_query_string_fields", "q_parent_id", "q_simple_query_string")
    Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1").foreach { dir =>
      names.foreach { name =>
        val (mn, med, rows) = timeOp(repeats) {
          graft.SparkEntry.queries(name)(spark, dir).count()
        }
        println(f"""{"q":"$name","dir":"$dir","min":$mn%.3f,"median":$med%.3f,"rows":$rows}""")
      }
      // the two INLINESTATS rewrite shapes, timed inline
      val (mn1, med1, r1) = timeOp(repeats) {
        graft.query.Esql.run(
          "FROM d | INLINESTATS m = MAX(n_chars) | WHERE n_chars == m | KEEP doc_id",
          _ => docs(dir)).count()
      }
      println(f"""{"q":"inlinestats_no_by","dir":"$dir","min":$mn1%.3f,"median":$med1%.3f,"rows":$r1}""")
      val (mn2, med2, r2) = timeOp(repeats) {
        graft.query.Esql.run(
          "FROM d | INLINESTATS med = MEDIAN(n_chars) BY lang | WHERE n_chars > med | STATS n = COUNT(*) BY lang | SORT lang",
          _ => docs(dir)).count()
      }
      println(f"""{"q":"inlinestats_ordered_set","dir":"$dir","min":$mn2%.3f,"median":$med2%.3f,"rows":$r2}""")
    }
    println(s"""{"probe":"r18","load_end":${loadAvg()}}""")
    spark.stop()
  }
}
