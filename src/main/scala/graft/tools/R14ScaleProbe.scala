package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.query.Percolator

/** Scale measurements for the round-14 changes, same protocol as
  * [[OpScaleProbe]]/[[R13ScaleProbe]] (min/median wall seconds over
  * repeats):
  *
  *  - `percolate_10k` (section `percolate`): 10,000 stored queries over
  *    the sf0.1 documents corpus — the single-plan form (all 10k
  *    predicates in one projection; whole-stage codegen falls back past
  *    its method budget and the driver pays a 10k-column analysis) versus
  *    `percolateSharded` at 1024 queries per plan (every shard codegen'd,
  *    ⌈n/1024⌉ scans). Parity of the two result sets is asserted, not
  *    assumed.
  *  - section `ops`: the round's new operators at 1× (sf0.1) vs 10× (the
  *    ScaleGen disjoint twin at `/tmp/graft_sf1`) — random projection,
  *    SQ8 build+ADC serve, fingerprint analyzer, FIM construction,
  *    hard-negative mining. All are designed row-local / one-scan; the
  *    probe verifies the ~linear wall shape instead of asserting it.
  *
  * Usage: `SPARK_GRAFT_SECTIONS=ops runMain graft.tools.R14ScaleProbe
  * [repeats]`. Emits one JSON line per measurement.
  */
object R14ScaleProbe {

  /** Checksum of the most recent countAndChecksum evaluation — threaded
    * through a var because timeOp's op contract returns only the row
    * count.
    */
  private var lastChecksum: String = "0"

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

    val sections = sys.env.getOrElse("SPARK_GRAFT_SECTIONS", "percolate,ops")
      .split(",").toSet
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    if (sections.contains("ops")) {
      import graft.ops.{Packing, Similarity}
      import graft.expr.TextMatch
      val twin = sys.env.getOrElse("SPARK_GRAFT_TWIN_DIR", "/tmp/graft_sf1")
      for ((label, dir) <- Seq("1x" -> sfDir, "10x" -> twin)) {
        val d = spark.read.parquet(s"$dir/documents.parquet")
        val e = spark.read.parquet(s"$dir/embeddings.parquet")
        emit(s"rp_project_$label", timeOp(repeats) {
          // aggregate an element so column pruning cannot drop the work
          Similarity.randomProject(e, "vec_id", "embedding", outDim = 16, dim = 64)
            .agg(sum(element_at(col("vec"), 1))).collect(); e.count()
        })
        emit(s"sq8_build_serve_$label", timeOp(repeats) {
          Similarity.sq8TopK(e, "vec_id", "embedding",
            e.limit(5), "vec_id", "embedding", k = 5, dim = 64).count()
        })
        emit(s"fingerprint_$label", timeOp(repeats) {
          d.select(TextMatch.fingerprint(col("text")).as("fp"))
            .agg(sum(length(col("fp")))).collect(); d.count()
        })
        emit(s"fim_$label", timeOp(repeats) {
          Packing.fimExamples(d, "doc_id", "text", fimRate = 0.5)
            .agg(sum(length(col("fim_text")))).collect(); d.count()
        })
        emit(s"hard_negatives_$label", timeOp(repeats) {
          Similarity.hardNegatives(e, "vec_id", "embedding",
            e.limit(5), "vec_id", "embedding",
            negK = 5, posThreshold = 0.3, negFloor = 0.2).count()
        })
      }
    }

    if (!sections.contains("percolate")) { spark.stop(); return }

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

    // Result-SET parity, not just row-count parity (round-14 advice: a
    // query matching extra docs in one shard while another loses some
    // would pass a count compare): each evaluation folds the match set
    // into an order-insensitive checksum — count plus the decimal sum of
    // xxhash64(query_id, doc_id) — in the same single pass the timing
    // measures, so the parity assertion costs no extra evaluation of the
    // 10k-predicate plans.
    def countAndChecksum(df: org.apache.spark.sql.DataFrame): Long = {
      val r = df.agg(count(lit(1)),
        sum(xxhash64(col("query_id"), col("doc_id")).cast("decimal(38,0)")))
        .collect()(0)
      lastChecksum = Option(r.getDecimal(1)).map(_.toBigInteger.toString).getOrElse("0")
      r.getLong(0)
    }

    System.err.println("[r14probe] timing sharded(1024)...")
    val sharded = timeOp(repeats) {
      countAndChecksum(
        Percolator.percolateSharded(docs, "doc_id", stored, maxQueriesPerPlan = 1024)
          .select("query_id", "doc_id"))
    }
    val shardedSum = lastChecksum
    emit("percolate_10k_sharded_1024", sharded)

    System.err.println("[r14probe] timing single plan (10k predicates, 1 pass)...")
    val onePlan = timeOp(1) {
      countAndChecksum(
        Percolator.percolateLong(docs, "doc_id", stored).select("query_id", "doc_id"))
    }
    val singleSum = lastChecksum
    emit("percolate_10k_single_plan", onePlan)

    require(sharded._3 == onePlan._3 && shardedSum == singleSum,
      s"parity violated: sharded=(${sharded._3}, $shardedSum) " +
        s"single=(${onePlan._3}, $singleSum)")
    println(s"""{"probe":"r14_scale","op":"percolate_10k_parity",""" +
      s""""rows":${sharded._3},"checksum":"$shardedSum"}""")

    spark.stop()
  }
}
