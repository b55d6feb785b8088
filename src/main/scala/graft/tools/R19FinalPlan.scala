package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-19 optimization evidence: EXECUTED plans. `explain("formatted")`
  * before execution prints the AQE initial plan (`isFinalPlan=false`),
  * which hides what actually ran — ReuseExchange dedup, AQE join
  * rewrites, and coalesced shuffle reads. This tool runs each named
  * registry query to completion through the noop sink (guide §1.4) and
  * dumps `queryExecution.executedPlan` — the final adaptive plan — to
  * `plans/r19/<name>_<suffix>.txt`. The action is a collect on the SAME
  * QueryExecution (a noop write would execute a fresh copy and leave this
  * one un-finalized); every registry query returns a bounded result by
  * contract, so the collect is small.
  *
  * Usage: runMain graft.tools.R19FinalPlan <sfDir> <outDir> <suffix> <names,csv>
  */
object R19FinalPlan {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, suffix, namesCsv) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    namesCsv.split(",").foreach { name =>
      try {
        spark.sparkContext.setJobDescription(s"finalplan: $name")
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        df.collect()
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"),
          df.queryExecution.executedPlan.toString)
        println(s"[finalplan] wrote ${name}_$suffix.txt")
      } catch {
        case e: Throwable => System.err.println(s"[finalplan] $name failed: $e")
      }
    }
    spark.stop()
  }
}
