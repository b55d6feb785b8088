package graft.query

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** MMR diversification: hand-traced greedy picks, the λ dials, and the
  * near-duplicate-suppression behavior the operator exists for.
  */
class MmrSpec extends SparkSpecBase {
  import spark.implicits._

  // One query; candidates: a/b near-identical high-relevance twins, c an
  // orthogonal mid-relevance doc, d a low-relevance near-copy of c.
  private def cands = Seq(
    (1L, 10L, 0.95, Seq(1.0, 0.0, 0.0)),
    (1L, 11L, 0.94, Seq(1.0, 0.05, 0.0)),
    (1L, 20L, 0.60, Seq(0.0, 1.0, 0.0)),
    (1L, 21L, 0.40, Seq(0.0, 1.0, 0.05)),
  ).toDF("query_id", "cand_id", "rel", "vec")

  test("greedy trace: relevance first, then diversity suppresses the twin") {
    val out = Mmr.diversify(cands, k = 3, lambda = 0.7)
      .select("pick", "cand_id").as[(Int, Long)].collect().sortBy(_._1).toSeq
    // pick 1 = pure relevance (10); pick 2: the twin 11 is crushed by its
    // ~1.0 similarity to 10 (0.7·0.94 − 0.3·~1.0 ≈ 0.36) while the
    // orthogonal 20 keeps 0.7·0.6 = 0.42; pick 3: 21 is now the near-copy
    // of selected 20 (penalty ~1.0 → ≈ −0.02) vs twin 11's 0.36.
    assert(out === Seq((1, 10L), (2, 20L), (3, 11L)))
  }

  test("lambda 1.0 reduces to pure relevance ranking") {
    val out = Mmr.diversify(cands, k = 3, lambda = 1.0)
      .select("pick", "cand_id").as[(Int, Long)].collect().sortBy(_._1).toSeq
    assert(out === Seq((1, 10L), (2, 11L), (3, 20L)))
  }

  test("pick-1 score is λ·rel; later scores subtract the max-sim penalty") {
    val out = Mmr.diversify(cands, k = 2, lambda = 0.7)
      .select("pick", "cand_id", "mmr").as[(Int, Long, Double)].collect()
      .sortBy(_._1).toSeq
    assert(out.head._3 === 0.7 * 0.95)
    // pick 2 is the orthogonal candidate 20: rel 0.6, max-sim 0.0 — the
    // same IEEE tree the engine computes
    assert(out(1)._2 === 20L)
    assert(out(1)._3 === 0.7 * 0.6 - (1.0 - 0.7) * 0.0)
  }

  test("multiple queries advance together; guards reject bad arguments") {
    val two = cands.unionByName(
      cands.withColumn("query_id", lit(2L)))
    val out = Mmr.diversify(two, k = 2, lambda = 0.7)
    assert(out.count() === 4)
    assert(out.groupBy("query_id").count().as[(Long, Long)].collect().toMap
      === Map(1L -> 2L, 2L -> 2L))
    intercept[IllegalArgumentException](Mmr.diversify(cands, k = 0, lambda = 0.5))
    intercept[IllegalArgumentException](Mmr.diversify(cands, k = 2, lambda = 1.5))
  }

  test("candidate bound is enforced in-plan: an oversized frame raises at checkpoint") {
    // query 1 has 4 candidates; maxCandidates=3 must raise DURING the
    // checkpoint materialization (the Hybrid.withRank discipline), before
    // a corpus-sized frame could silently land on executor storage
    val e = intercept[Exception] {
      Mmr.diversify(cands, k = 2, lambda = 0.7, maxCandidates = 3).collect()
    }
    assert(e.getMessage.contains("exceed maxCandidates=3"))
    // at the bound exactly, the guard passes untouched
    assert(Mmr.diversify(cands, k = 2, lambda = 0.7, maxCandidates = 4)
      .count() === 2)
  }
}
