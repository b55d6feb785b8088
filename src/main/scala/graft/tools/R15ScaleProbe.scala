package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale measurements for the round-15 additions, same protocol as
  * [[OpScaleProbe]]/[[R14ScaleProbe]] (min/median wall seconds over
  * repeats, 1× = sf0.1, 10× = the ScaleGen disjoint twin at
  * `/tmp/graft_sf1`):
  *
  *  - `span_near` / `intervals`: the position-list proximity predicates —
  *    row-local nested higher-order exists whose per-row cost is the
  *    product of the matched terms' occurrence counts (bounded by
  *    document length), so corpus wall time should scale ~linearly.
  *  - `bm25_boosted`: per-term-weighted BM25 — the identical one-scan +
  *    broadcast-stats shape as the unboosted run (the weight is one
  *    multiply in the codegen'd score tree).
  *  - `function_score_modes`: the combine-mode fold — row-local CASE
  *    algebra over three functions, one corpus scan.
  *
  * Usage: `runMain graft.tools.R15ScaleProbe [repeats=3]` after ScaleGen.
  * Emits one JSON line per measurement.
  */
object R15ScaleProbe {

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
      .appName("graft-r15-scale-probe")
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(s"""{"probe":"r15_scale","load_start":${loadAvg()}}""")

    def emit(op: String, r: (Double, Double, Long)): Unit =
      println(s"""{"probe":"r15_scale","op":"$op",""" +
        s""""min":${math.round(r._1 * 1000) / 1000.0},""" +
        s""""median":${math.round(r._2 * 1000) / 1000.0},"rows":${r._3}}""")

    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val twin = sys.env.getOrElse("SPARK_GRAFT_TWIN_DIR", "/tmp/graft_sf1")

    import graft.query.{Bm25, FilterSpec, QueryString, Scoring}

    for ((label, dir) <- Seq("1x" -> sfDir, "10x" -> twin)) {
      val d = spark.read.parquet(s"$dir/documents.parquet")

      emit(s"span_near_$label", timeOp(repeats) {
        d.where(FilterSpec.SpanNear("text",
          Seq("spark", "scan", "merge"), 4, inOrder = false).compile).count()
      })
      emit(s"intervals_$label", timeOp(repeats) {
        d.where(FilterSpec.IntervalsMatch("text",
          "scan spark", 3, ordered = true).compile).count()
      })
      emit(s"intervals_all_of_$label", timeOp(repeats) {
        d.where(FilterSpec.IntervalsAllOf("text",
          Seq(Seq("spark", "big vector"), Seq("merge join", "scan")),
          maxGaps = 3).compile).count()
      })
      emit(s"bm25_boosted_$label", timeOp(repeats) {
        Bm25.topKBoosted(d, "doc_id",
          concat(lit(" "), graft.expr.TextMatch.normalized(col("text")), lit(" ")),
          QueryString.boostedTerms("vector^2 dup scan^0.5"), k = 15).count()
      })
      emit(s"function_score_modes_$label", timeOp(repeats) {
        import Scoring.ScoreFunction
        val qscore = Scoring.fieldValueFactor(col("n_chars"), 0.01, "sqrt")
        val fns = Seq(
          ScoreFunction(Scoring.linearDecay(col("n_chars").cast("double"), 400, 200), 2.0),
          ScoreFunction(lit(1.0), 3.0, Some(col("lang") === "en")),
          ScoreFunction(Scoring.fieldValueFactor(col("doc_id"), 0.5, "log1p"),
            filter = Some(pmod(col("doc_id"), lit(2)) === 0)))
        d.select(col("doc_id"),
            Scoring.functionScore(qscore, fns, "sum", "multiply", 4.0).as("s"))
          .agg(sum(col("s"))).collect(); d.count()
      })
    }

    println(s"""{"probe":"r15_scale","load_end":${loadAvg()}}""")
    spark.stop()
  }
}
