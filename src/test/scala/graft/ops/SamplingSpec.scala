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
}
