package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-proof of the serve-from-preaggregates tier (round-11 ask #5):
  * show that rollup-served dashboard aggregations stay ~FLAT when the
  * corpus grows 10×, while their corpus-scan twins grow ~linearly — and
  * price the rollup BUILD honestly (the ingest-side cost the flat serving
  * buys).
  *
  * The committed dashboard bench queries cannot express this directly:
  * their corpus is the fixed city-fixture federation (SURVEY §3.2), which
  * no scale twin grows. This probe runs the SAME [[graft.query.PreAgg]]
  * serving functions those queries serve through — termsTopN, nestedTerms,
  * significantTerms, typeahead — over the sf0.1 `events` table (100k rows)
  * and a synthesized 10× twin (1M rows) with identical per-copy
  * distributions, so rollup dimension cardinality is corpus-invariant
  * (the defining property the flat-serving claim rests on).
  *
  * Usage: `runMain graft.tools.ServeScaleProbe [repeats=5]`
  * Emits one JSON line per (scale, op) measurement: min/median seconds.
  */
object ServeScaleProbe {

  private def timeOp(repeats: Int)(op: => Unit): (Double, Double) = {
    val times = (1 to repeats).map { _ =>
      val t0 = System.nanoTime()
      op
      (System.nanoTime() - t0) / 1e9
    }.sorted
    (times.min, times(times.size / 2))
  }

  def main(args: Array[String]): Unit = {
    val repeats = if (args.nonEmpty) args(0).toInt else 5
    val spark = SparkSession.builder()
      .appName("graft-serve-scale-probe")
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val src = "/root/testdata/sf0.1/events.parquet"
    // N× twins: explode N copies with remapped event/user ids and
    // UNCHANGED (ts, event_type, value) — per-copy distributions are
    // identical, so every rollup dimension keeps its cardinality while
    // counts grow N× (the linear-semantics contract ScaleGen documents).
    // `props` is dropped: no dimension derives from it and column pruning
    // keeps it out of every scan either way.
    def twin(n: Int): String = {
      val dir = s"/tmp/graft_events$n"
      if (!new java.io.File(dir).exists()) {
        spark.read.parquet(src)
          .withColumn("_k", explode(sequence(lit(0), lit(n - 1))))
          .select(
            (col("event_id") * n + col("_k")).as("event_id"),
            col("ts"),
            (col("user_id") * n + col("_k")).as("user_id"),
            col("event_type"), col("value"))
          .repartition(32)
          .write.mode("overwrite").parquet(s"$dir/events.parquet")
      }
      s"$dir/events.parquet"
    }

    def dims = Seq[(String, org.apache.spark.sql.Column)](
      "description" -> col("event_type"),
      "year" -> year(col("ts")),
      "hour" -> hour(col("ts")),
      "dayofweek" -> date_format(col("ts"), "EEEE"))

    def run(label: String, path: String): Unit = {
      val corpus = spark.read.parquet(path).withColumn("ts", col("ts").cast("timestamp"))
      corpus.count() // touch the files once before any timed window
      def emit(op: String, t: (Double, Double), extra: String = ""): Unit =
        println(s"""{"probe":"serve_scale","scale":"$label","op":"$op",""" +
          s""""min":${"%.3f".format(t._1)},"med":${"%.3f".format(t._2)}$extra}""")

      // the ingest-side price: one corpus scan + map-side-combined agg,
      // plus the publish collect (rollup cardinality rows)
      var rollupRows = 0L
      emit("rollup_build", timeOp(repeats) {
        rollupRows = graft.query.PreAgg.increment(corpus, dims).count()
      }, s""","rollup_rows":$rollupRows""")
      // serve-many: pin the rollup once (what PreAgg.materialize does for
      // a session), then time the serving aggregations over it
      val rollup = graft.query.PreAgg.increment(corpus, dims)
      val pinned = {
        val rows = rollup.collect()
        spark.createDataFrame(java.util.Arrays.asList(rows: _*), rollup.schema)
      }
      emit("serve_terms_preagg", timeOp(repeats) {
        graft.query.PreAgg.termsTopN(pinned, "description", 10).count() })
      emit("serve_nested_preagg", timeOp(repeats) {
        graft.query.PreAgg.nestedTerms(pinned, "dayofweek", "description", 7, 10).count() })
      emit("serve_sigterms_preagg", timeOp(repeats) {
        graft.query.PreAgg.significantTerms(pinned, "description",
          col("hour") >= 0 && col("hour") <= 6, 10).count() })
      emit("serve_typeahead_preagg", timeOp(repeats) {
        graft.query.PreAgg.typeahead(pinned, "description", "c", 10).count() })
      // the corpus-scan twins the rollup replaces — the ~linear baseline
      emit("serve_terms_scan", timeOp(repeats) {
        graft.query.Aggs.termsTopN(corpus.select(col("event_type").as("description")),
          "description", 10).count() })
      emit("serve_sigterms_scan", timeOp(repeats) {
        graft.query.Aggs.significantTerms(
          corpus.select(array(col("event_type")).as("terms"), hour(col("ts")).as("hour")),
          col("terms"), col("hour") >= 0 && col("hour") <= 6, 10).count() })
    }

    println(s"""{"probe":"serve_scale","load_start":${"%.2f".format(
      java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage)}}""")
    run("1x", src)
    run("10x", twin(10))
    run("100x", twin(100))
    println(s"""{"probe":"serve_scale","load_end":${"%.2f".format(
      java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage)}}""")
    spark.stop()
  }
}
