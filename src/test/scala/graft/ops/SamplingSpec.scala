package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Deterministic sampling: stability under repartitioning, fraction
  * calibration, split totality, stratum isolation.
  */
class SamplingSpec extends SparkSpecBase {
  import spark.implicits._

  private def docs = (1L to 2000L).map(i => (i, s"src${i % 4}")).toDF("id", "src")

  test("hashSample is deterministic and partition-invariant") {
    val a = Sampling.hashSample(docs, "id", 0.2).select("id").as[Long].collect().sorted.toSeq
    val b = Sampling.hashSample(docs.repartition(13), "id", 0.2)
      .select("id").as[Long].collect().sorted.toSeq
    assert(a === b)
    // calibration: fraction of 2000 rows within a loose binomial band
    assert(a.length > 300 && a.length < 500, s"got ${a.length}")
  }

  test("a larger fraction strictly contains a smaller one (nested samples)") {
    val small = Sampling.hashSample(docs, "id", 0.1).select("id").as[Long].collect().toSet
    val large = Sampling.hashSample(docs, "id", 0.3).select("id").as[Long].collect().toSet
    assert(small.subsetOf(large))
  }

  test("assignSplit labels every row exactly once with calibrated shares") {
    val out = Sampling.assignSplit(docs, "id", Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125))
    assert(out.count() === 2000)
    val byKey = out.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(byKey.keySet === Set("train", "val", "test"))
    assert(byKey("train") > 1400 && byKey("train") < 1600, byKey.toString)
    // re-running yields identical assignment
    val again = Sampling.assignSplit(docs, "id", Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125))
    assert(out.orderBy("id").select("split").as[String].collect().toSeq
      === again.orderBy("id").select("split").as[String].collect().toSeq)
  }

  test("stratified sampling keeps only listed strata at their fractions") {
    val out = Sampling.stratifiedHashSample(docs, "id", "src",
      Map("src0" -> 1.0, "src1" -> 0.5))
    val byStratum = out.groupBy("src").count().as[(String, Long)].collect().toMap
    assert(byStratum("src0") === 500)                      // fraction 1.0 keeps all
    assert(byStratum("src1") > 180 && byStratum("src1") < 320)
    assert(!byStratum.contains("src2") && !byStratum.contains("src3"))
  }

  test("different seeds draw different samples") {
    val a = Sampling.hashSample(docs, "id", 0.2, seed = 1).select("id").as[Long].collect().toSet
    val b = Sampling.hashSample(docs, "id", 0.2, seed = 2).select("id").as[Long].collect().toSet
    assert(a !== b)
  }

  test("mixFractions keeps the binding source whole, downsamples the rest") {
    val f = Sampling.mixFractions(Map("a" -> 8L, "b" -> 4L), Seq("a" -> 0.5, "b" -> 0.5))
    // b binds (4/0.5 = 8 < 8/0.5 = 16): b kept whole, a halved → 4 and 4.
    assert(f("b") == 1.0 && f("a") == 0.5)
    val g = Sampling.mixFractions(Map("a" -> 90L, "b" -> 10L), Seq("a" -> 0.5, "b" -> 0.5))
    assert(g("b") == 1.0)
    assert(math.abs(g("a") - 10.0 / 90.0) < 1e-15) // a: 0.5·20/90
    // expected mixture after sampling: 10 vs 10 — equal shares
    assert(math.abs(90 * g("a") - 10 * g("b")) < 1e-9)
  }

  test("mixToTarget achieves the target mixture and drops unnamed sources") {
    val df = ((1L to 300L).map(i => (i, "a")) ++ (301L to 400L).map(i => (i, "b")) ++
      (401L to 450L).map(i => (i, "c"))).toDF("id", "src")
    val out = Sampling.mixToTarget(df, "id", "src", Seq("a" -> 0.5, "b" -> 0.5))
    val byS = out.groupBy("src").count().as[(String, Long)].collect().toMap
    assert(!byS.contains("c"))
    assert(byS("b") == 100)                     // binding source kept whole
    assert(byS("a") > 70 && byS("a") < 130)     // hash-sampled toward 100
    // determinism: the same call returns the same rows
    val again = Sampling.mixToTarget(df, "id", "src", Seq("a" -> 0.5, "b" -> 0.5))
      .select("id").as[Long].collect().toSet
    assert(again == out.select("id").as[Long].collect().toSet)
  }

  test("tokenBudgetSelect: prefix of the hash order, invariant to bucket count") {
    import org.apache.spark.sql.functions.col
    val docs = (1L to 40L)
      .map(i => (i, if (i % 2 == 0) "a" else "b", ("w " * (i % 7 + 1).toInt).trim))
      .toDF("id", "src", "text")
    val tok = graft.ops.TextAnalysis.tokenCount(col("text"))
    def run(buckets: Int) =
      Sampling.tokenBudgetSelect(docs, "id", "src", tok, budget = 30L,
          numBuckets = buckets)
        .as[(Long, String, Long, Long)].collect().toSet
    // numBuckets=1 IS the trivially-correct single global window; any
    // bucketing must reproduce it exactly (offsets + interior cumsums)
    val global = run(1)
    assert(global == run(7) && global == run(64))
    assert(global.nonEmpty && global.forall(_._4 <= 30L))
    // both sources fill toward (but never past) their budget
    for (s <- Seq("a", "b")) {
      val cums = global.filter(_._2 == s).map(_._4)
      assert(cums.nonEmpty && cums.max <= 30L && cums.max > 20L)
    }
  }

  test("tokenBudgetSelect: a NULL source is its own budget group, not dropped") {
    import org.apache.spark.sql.functions.col
    val docs = ((1L to 10L).map(i => (i, Option("a"), "w w w")) ++
      (11L to 20L).map(i => (i, Option.empty[String], "w w w")))
      .toDF("id", "src", "text")
    val tok = graft.ops.TextAnalysis.tokenCount(col("text"))
    val out = Sampling.tokenBudgetSelect(docs, "id", "src", tok, budget = 9L)
      .as[(Long, Option[String], Long, Long)].collect()
    // SQL's PARTITION BY keeps NULL as one group; the offsets join must be
    // null-safe or these rows vanish silently
    val nullGroup = out.filter(_._2.isEmpty)
    assert(nullGroup.length === 3 && nullGroup.forall(_._4 <= 9L))
    assert(out.count(_._2.contains("a")) === 3)
  }

  test("perSourceCap: exactly cap docs per big source, hash-order prefix, bucket-invariant") {
    import org.apache.spark.sql.functions.col
    val docs = (1L to 40L)
      .map(i => (i, if (i % 4 == 0) "small" else "big", "text"))
      .toDF("id", "src", "text") // big: 30 docs, small: 10
    def run(buckets: Int) =
      Sampling.perSourceCap(docs, "id", "src", cap = 8, numBuckets = buckets)
        .as[(Long, String, Long)].collect().toSet
    val global = run(1)
    assert(global === run(5) && global === run(64))
    // the dominating source is cut to exactly cap; the small one (10 > 8)
    // is cut too; ranks are a dense 1..cap prefix per source
    for (s <- Seq("big", "small")) {
      val ranks = global.filter(_._2 == s).map(_._3).toSeq.sorted
      assert(ranks === (1L to 8L), s"source $s ranks: $ranks")
    }
    // the kept set is the hash-order prefix: recomputing the hash rank
    // directly agrees row for row
    val direct = docs.withColumn("u", Sampling.hashUnit(col("id"), 42))
      .withColumn("r", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("src")
          .orderBy(col("u"), col("id"))))
      .where(col("r") <= 8).select("id").as[Long].collect().toSet
    assert(global.map(_._1) === direct)
    intercept[IllegalArgumentException](
      Sampling.perSourceCap(docs, "id", "src", cap = 0))
  }

  test("mixTemperature keeps the smallest source whole and lifts its share") {
    // sources 1600/400/100: raw shares 76/19/5%; sqrt-tempered weights
    // 40/20/10 → kept fractions 10·sqrt/c: 0.25/0.5/1.0
    val df = ((1L to 1600L).map(i => (i, "big")) ++
      (2001L to 2400L).map(i => (i, "mid")) ++
      (3001L to 3100L).map(i => (i, "small"))).toDF("id", "src")
    val kept = Sampling.mixTemperature(df, "id", "src", alpha = 0.5)
      .groupBy("src").count().as[(String, Long)].collect().toMap
    assert(kept("small") === 100L) // binding source: kept whole
    // hash-binomial bands around 400·0.5 and 1600·0.25
    assert(kept("mid") > 160 && kept("mid") < 240, kept.toString)
    assert(kept("big") > 330 && kept("big") < 470, kept.toString)
    // the tempered mixture lifts the small source's share above its raw 5%
    val total = kept.values.sum.toDouble
    assert(kept("small") / total > 0.10)
    assert(intercept[IllegalArgumentException] {
      Sampling.mixTemperature(df, "id", "src", alpha = 0.0)
    }.getMessage.contains("alpha"))
  }

  // ---- DSIR importance scoring ----

  /** Two sublanguages over disjoint bigrams: "wiki"-flavored target docs
    * and "spam"-flavored raw-only docs, plus mixed ones.
    */
  private def corpus = Seq(
    (0L, "en", "the quick brown fox jumps over the lazy dog again today"),
    (1L, "en", "the quick brown fox jumps over the lazy dog again tonight"),
    (2L, "en", "a quick brown fox jumps over a lazy dog every day"),
    (3L, "xx", "buy cheap pills now buy cheap pills now buy cheap pills"),
    (4L, "xx", "buy cheap pills now click here buy cheap pills now click"),
    (5L, "xx", "the quick brown fox buy cheap pills now lazy dog"),
  ).toDF("doc_id", "lang", "text")

  test("importanceScores ranks target-like documents above raw-only ones") {
    val out = Sampling.importanceScores(corpus, "doc_id", "text",
        targetCond = col("lang") === "en", numBuckets = 256, carry = Seq("lang"))
      .orderBy("doc_id")
      .select("doc_id", "lang", "n_feats", "bits", "bits_per_1k")
      .as[(Long, String, Long, Long, Double)].collect()
    assert(out.length === 6)
    val rate = out.map(r => r._1 -> r._5).toMap
    // every target-flavored doc outranks every spam-flavored doc; the
    // mixed doc 5 falls strictly between the two blocks
    for (t <- Seq(0L, 1L, 2L); s <- Seq(3L, 4L)) assert(rate(t) > rate(s))
    assert(rate(5L) < Seq(0L, 1L, 2L).map(rate).min)
    assert(rate(5L) > Seq(3L, 4L).map(rate).max)
    // n_feats = bigram positions
    assert(out.find(_._1 === 0L).get._3 === 10L)
  }

  test("importanceScores is deterministic and partition-invariant") {
    def run(df: org.apache.spark.sql.DataFrame) =
      Sampling.importanceScores(df, "doc_id", "text", col("lang") === "en")
        .orderBy("doc_id").select("doc_id", "bits").as[(Long, Long)].collect().toSeq
    assert(run(corpus) === run(corpus.repartition(7)))
  }

  test("importanceScores clips per-feature weights to ±clipBits") {
    val out = Sampling.importanceScores(corpus, "doc_id", "text",
      targetCond = col("lang") === "en", clipBits = 1)
    val rates = out.select("bits", "n_feats").as[(Long, Long)].collect()
    rates.foreach { case (bits, n) => assert(math.abs(bits) <= n) }
  }

  test("importancePriority draws proportionally more target documents") {
    // corpus of 400 docs, half target-flavored, half spam-flavored: the
    // top-100 priority draw must lean heavily toward the target side
    val big = (0L until 400L).map { i =>
      if (i % 2 == 0) (i, "en", s"the quick brown fox jumps over the lazy dog d$i")
      else (i, "xx", s"buy cheap pills now click here win big prize p$i")
    }.toDF("doc_id", "lang", "text")
    val scored = Sampling.importanceScores(big, "doc_id", "text",
      col("lang") === "en", carry = Seq("lang")).cache()
    // anchor the shift just above the minimum rate so the weight RATIO is
    // large (a generic shift like 16001 keeps weights positive but nearly
    // equal, and the draw barely leans — proportionality is only as strong
    // as the weights are spread)
    val minRate = scored.agg(min("bits_per_1k")).as[Double].head()
    val shift = -minRate + 1.0
    def draw() = Sampling.importancePriority(scored, "doc_id", shift)
      .orderBy(desc("pri"), col("doc_id")).limit(100)
      .select("lang").as[String].collect()
    val top = draw()
    val en = top.count(_ == "en")
    assert(en > 85, s"expected a target-dominated draw, got $en/100 en")
    // and the draw is reproducible
    assert(top.toSeq === draw().toSeq)
  }

  test("clusterSafeSplit: no near-dup pair straddles a split boundary") {
    import spark.implicits._
    val docs = (1L to 200L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // two chains (1-2-3, 10-11) plus singletons
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val w = Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125)
    val split = Sampling.clusterSafeSplit(docs, "doc_id", pairs, w)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    // the leakage property: every pair co-located, transitively
    assert(split(1L) === split(2L) && split(2L) === split(3L))
    assert(split(10L) === split(11L))
    // singletons fall where assignSplit puts them — on an empty pair set
    // the two operators agree row for row
    val plain = Sampling.assignSplit(docs, "doc_id", w)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val viaEmpty = Sampling.clusterSafeSplit(docs, "doc_id",
        pairs.where(lit(false)), w)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(viaEmpty === plain)
    (12L to 200L).foreach(i => assert(split(i) === plain(i)))
    // and the split is exhaustive over the weights' labels
    assert(split.values.toSet.subsetOf(Set("train", "val", "test")))
  }
}
