package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: initialize executor pool, parquet reader, and codegen
    // compiler once so the first timed query measures the query, not JVM
    // startup (~4-5s otherwise attributed to whichever query sorts first).
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().count()
    // Deterministic (sorted) order so per-query timings are comparable
    // across rounds; failures surface on stderr instead of vanishing.
    // SPARK_GRAFT_ONLY=comma,list restricts to named queries (local
    // iteration). Each query runs SPARK_GRAFT_REPEAT times (default 2) and
    // reports the fastest pass: this host is shared and single-run timings
    // swing 1.5-3x with neighbor load; the minimum is the standard
    // noise-robust estimator of what the code actually costs.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    // Default 3 passes: with 2, one neighbor-load spike poisons the median
    // (it becomes the mean of one clean and one noisy pass); with 3 the
    // median is a clean pass unless two of three are disturbed.
    val repeat = sys.env.getOrElse("SPARK_GRAFT_REPEAT", "3").toInt.max(1)
    // Both the min (noise-floor estimate of what the code costs) and the
    // median (typical pass) are reported per query, so cross-round
    // comparisons don't depend on the estimator choice.
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .map { case (name, fn) =>
      // `_warm` queries measure the steady-state serving path (SURVEY §3.3).
      // Populate the cache once untimed first: otherwise the first timed
      // pass pays the cold cache build and the reported median reads as
      // "no gain" when the true warm cost is 10-30x lower.
      if (name.endsWith("_warm")) {
        try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
      }
      val times = (1 to repeat).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch {
          case e: Throwable => System.err.println(s"[bench] $name failed: $e")
        }
        (System.nanoTime() - t0) / 1e9
      }
      (name, times.min, median(times))
    }
    def jmap(vs: Seq[(String, Double)]): String =
      vs.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    val qs = jmap(results.map(r => r._1 -> r._2))
    val qsMed = jmap(results.map(r => r._1 -> r._3))
    val total = results.map(_._2).sum
    val totalMed = results.map(_._3).sum
    // Headline totals go LAST on the line: the driver's output capture keeps
    // the tail, so a truncated capture loses per-query detail, not the
    // totals (r3's committed artifact lost the min total to head-truncation).
    println(s"""{"metric":"total","unit":"sec","repeat":$repeat,"sf":"$sfDir","queries":$qs,"queries_median":$qsMed,"total_median":$totalMed,"value":$total}""")
    spark.stop()
  }
}
