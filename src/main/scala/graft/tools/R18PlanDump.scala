package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-18 optimization evidence: dump `explain("formatted")` for named
  * registry queries to `plans/r18/<name>_<suffix>.txt` — run once against
  * the pre-optimization tree (`suffix = before`) and once after
  * (`suffix = after`), so the committed pair documents every plan-shape
  * claim in OPTIMIZATION_r18.md. Queries with in-query writes execute
  * their side effects during construction (use a small SF dir).
  *
  * Usage: runMain graft.tools.R18PlanDump <sfDir> <outDir> <suffix> <names,csv>
  */
object R18PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, suffix, namesCsv) = args
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    namesCsv.split(",").foreach { name =>
      try {
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        val out = new java.io.ByteArrayOutputStream()
        Console.withOut(new java.io.PrintStream(out)) { df.explain("formatted") }
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"), out.toString)
        println(s"[plandump] wrote ${name}_$suffix.txt")
      } catch {
        case e: Throwable => System.err.println(s"[plandump] $name failed: $e")
      }
    }
    spark.stop()
  }
}
