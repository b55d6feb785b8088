package graft.query

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** sparse_vector (ELSER/SPLADE-shape) retrieval: tf postings, hand dot
  * products, ranking tiebreak, guards — and the plan shape (broadcast
  * join on term, no corpus HOF).
  */
class SparseVectorSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "vector scan vector"), // vector tf 2, scan tf 1
    (2L, "dup merge"),          // dup tf 1
    (3L, "scan scan scan"),     // scan tf 3
    (4L, "nothing here"),       // no query term — absent from results
  ).toDF("doc_id", "text")

  private val q = Seq("vector" -> 2.0, "dup" -> 1.5, "scan" -> 0.5)

  test("tfPostings: one (id, term, tf) row per distinct term") {
    val p = SparseVector.tfPostings(docs, "doc_id", "text")
      .as[(Long, String, Double)].collect().toSet
    assert(p === Set((1L, "vector", 2.0), (1L, "scan", 1.0),
      (2L, "dup", 1.0), (2L, "merge", 1.0), (3L, "scan", 3.0),
      (4L, "nothing", 1.0), (4L, "here", 1.0)))
  }

  test("score is the sparse dot product; docs sharing no term are absent") {
    val postings = SparseVector.tfPostings(docs, "doc_id", "text")
    val got = SparseVector.score(postings, "doc_id", q)
      .as[(Long, Double)].collect().sortBy(_._1).toSeq
    // doc 1: 2·2.0 + 1·0.5 = 4.5; doc 2: 1·1.5; doc 3: 3·0.5 = 1.5
    assert(got === Seq((1L, 4.5), (2L, 1.5), (3L, 1.5)))
  }

  test("topK ranks score DESC with id tiebreak; k bounds the page") {
    val postings = SparseVector.tfPostings(docs, "doc_id", "text")
    val got = SparseVector.topK(postings, "doc_id", q, k = 2)
      .as[(Long, Int, Double)].collect().sortBy(_._2).toSeq
    // docs 2 and 3 tie at 1.5 — the lower id wins rank 2
    assert(got === Seq((1L, 1, 4.5), (2L, 2, 1.5)))
    intercept[IllegalArgumentException](
      SparseVector.topK(postings, "doc_id", q, k = 0))
    intercept[IllegalArgumentException](
      SparseVector.score(postings, "doc_id", Nil))
    intercept[IllegalArgumentException](
      SparseVector.score(postings, "doc_id", Seq("a" -> 1.0, "a" -> 2.0)))
  }

  test("plan: the query literals broadcast; no corpus-side HOF or cross join") {
    val postings = SparseVector.tfPostings(docs, "doc_id", "text")
    val plan = SparseVector.score(postings, "doc_id", q)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("bucketed at-rest postings: identical scores, scan dynamically prunes to query buckets") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sv_dpp").toFile
    dir.deleteOnExit()
    val p = dir.getAbsolutePath + "/postings"
    SparseVector.tfPostingsBucketed(docs, "doc_id", "text", numBuckets = 16)
      .write.partitionBy("term_bucket").parquet(p)
    val atRest = spark.read.parquet(p)
    val got = SparseVector.score(atRest, "doc_id", q, numBuckets = 16)
      .as[(Long, Double)].collect().sortBy(_._1).toSeq
    // layout invisible to results
    assert(got === Seq((1L, 4.5), (2L, 1.5), (3L, 1.5)))
    // ... and visible to the SCAN: the literal-derived buckets arrive
    // as a STATIC partition filter — unprobed bucket directories never
    // even enumerate (stronger than the ivfRadius dynamic pruning,
    // possible here because query terms are driver-side literals)
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) {
      SparseVector.score(atRest, "doc_id", q, numBuckets = 16)
        .explain("formatted")
    }
    val pf = out.toString.linesIterator
      .find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("term_bucket") && pf.contains(" IN "),
      s"postings scan lacks the static bucket partition filter:\n$out")
  }

  test("prune drops tokens that are BOTH frequent outliers AND light; either alone survives") {
    val postings = SparseVector.tfPostings(docs, "doc_id", "text")
    // dfs: scan 2, everything else 1; avg df = 7 rows / 6 terms ≈ 1.17.
    // At freqRatio 1.0 only 'scan' is a frequent outlier; best weight 2.0
    // puts the light bar at 0.8 → 'scan' (0.5, frequent+light) prunes,
    // 'dup' (1.5, light bar cleared) and 'vector' (infrequent) survive.
    val q3 = Seq("vector" -> 2.0, "dup" -> 1.5, "scan" -> 0.5)
    assert(SparseVector.prune(postings, q3, freqRatioThreshold = 1.0)
      === Seq("vector" -> 2.0, "dup" -> 1.5))
    // frequent but HEAVY survives: scan at weight 1.9 clears 0.8
    assert(SparseVector.prune(postings,
      Seq("vector" -> 2.0, "scan" -> 1.9), freqRatioThreshold = 1.0)
      === Seq("vector" -> 2.0, "scan" -> 1.9))
    // light but RARE survives: dup df 1 is below any ≥1 ratio of avg
    assert(SparseVector.prune(postings,
      Seq("vector" -> 2.0, "dup" -> 0.1), freqRatioThreshold = 1.0)
      === Seq("vector" -> 2.0, "dup" -> 0.1))
    // ES defaults (5× average) prune nothing on this near-uniform corpus
    assert(SparseVector.prune(postings, q3) === q3)
    // the rescore complement: ONLY the pruned tokens
    assert(SparseVector.prune(postings, q3, freqRatioThreshold = 1.0,
      onlyScorePrunedTokens = true) === Seq("scan" -> 0.5))
    intercept[IllegalArgumentException](SparseVector.prune(postings, q3,
      onlyScorePrunedTokens = true)) // nothing pruned at defaults
    // a query term absent from the corpus has df 0 — kept
    assert(SparseVector.prune(postings,
      Seq("vector" -> 2.0, "ghost" -> 0.1), freqRatioThreshold = 1.0)
      === Seq("vector" -> 2.0, "ghost" -> 0.1))
    // thresholds outside the ES ranges reject loudly
    intercept[IllegalArgumentException](
      SparseVector.prune(postings, q3, freqRatioThreshold = 0.5))
    intercept[IllegalArgumentException](
      SparseVector.prune(postings, q3, weightThreshold = 1.5))
    // the serving shape: pruning against a PRECOMPUTED (maintained)
    // df table decides identically to the corpus-scanning form — and
    // an at-rest round-trip of the stats changes nothing (integer dfs)
    val stats = SparseVector.dfStats(postings)
    assert(SparseVector.pruneAgainstDf(stats, q3, freqRatioThreshold = 1.0)
      === SparseVector.prune(postings, q3, freqRatioThreshold = 1.0))
    val dir = java.nio.file.Files.createTempDirectory("graft_sv_df").toFile
    dir.deleteOnExit()
    val p = dir.getAbsolutePath + "/df"
    stats.write.parquet(p)
    assert(SparseVector.pruneAgainstDf(spark.read.parquet(p), q3,
      freqRatioThreshold = 1.0, onlyScorePrunedTokens = true)
      === Seq("scan" -> 0.5))
  }

  test("quantizeWeights snaps to k/2^bits dyadics, round-half-up") {
    val got = SparseVector.quantizeWeights(
      Seq("a" -> 1.7, "b" -> 0.9, "c" -> -0.31), bits = 8)
    assert(got === Seq("a" -> 435.0 / 256, "b" -> 230.0 / 256, "c" -> -79.0 / 256))
    // every output is exactly representable: w·2^bits is an integer
    got.foreach { case (_, w) => assert(w * 256 === math.rint(w * 256)) }
    // already-dyadic weights are fixed points
    assert(SparseVector.quantizeWeights(Seq("a" -> 1.5, "b" -> 0.25))
      === Seq("a" -> 1.5, "b" -> 0.25))
    intercept[IllegalArgumentException](
      SparseVector.quantizeWeights(Seq("a" -> 1.0), bits = 0))
    intercept[IllegalArgumentException](
      SparseVector.quantizeWeights(Seq("a" -> 1.0), bits = 31))
  }

  test("a numBuckets mismatch against the layout's contract column raises, never returns empty") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sv_nb").toFile
    dir.deleteOnExit()
    val p = dir.getAbsolutePath + "/postings"
    SparseVector.tfPostingsBucketed(docs, "doc_id", "text", numBuckets = 16)
      .write.partitionBy("term_bucket").parquet(p)
    val atRest = spark.read.parquet(p)
    // the layout is self-describing: num_buckets rides as a constant column
    assert(atRest.select("num_buckets").distinct()
      .as[Int].collect().toSeq === Seq(16))
    // wrong bucket count → loud raise BEFORE any scoring (the silent-empty
    // failure mode the scaladoc forbids)
    val ex = intercept[IllegalArgumentException](
      SparseVector.score(atRest, "doc_id", q, numBuckets = 32))
    assert(ex.getMessage.contains("num_buckets=16") &&
      ex.getMessage.contains("numBuckets=32"), ex.getMessage)
    // matching count still serves identically
    assert(SparseVector.score(atRest, "doc_id", q, numBuckets = 16)
      .as[(Long, Double)].collect().sortBy(_._1).toSeq
      === Seq((1L, 4.5), (2L, 1.5), (3L, 1.5)))
    // a hand-built bucketed table WITHOUT the contract column keeps the
    // documented trust-the-caller behavior
    val legacy = atRest.drop("num_buckets")
    assert(SparseVector.score(legacy, "doc_id", q, numBuckets = 16)
      .as[(Long, Double)].collect().sortBy(_._1).toSeq
      === Seq((1L, 4.5), (2L, 1.5), (3L, 1.5)))
  }
}
