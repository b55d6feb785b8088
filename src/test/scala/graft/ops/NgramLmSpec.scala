package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Bigram LM perplexity proxy: hand-computed counts and costs, the OOV
  * branch, zero-bigram documents, the two-sided gate, and the
  * broadcast-join scoring plan.
  *
  * Hand corpus (minCount = 2):
  *   d1 "a b a b"  → bigrams (a,b)×2, (b,a)
  *   d2 "a b c"    → (a,b), (b,c)
  *   d3 "x"        → none
  *   d4 "c a b"    → (c,a), (a,b)
  * counts: (a,b)=4, (b,a)=1, (b,c)=1, (c,a)=1 → head {(a,b):4};
  * contexts: a=4, b=2, c=1(pruned).
  */
class NgramLmSpec extends SparkSpecBase {
  import spark.implicits._

  private def docs = Seq(
    (1L, "a b a b"),
    (2L, "a b c"),
    (3L, "x"),
    (4L, "c a b")).toDF("doc_id", "text")

  test("bigramCounts: row-local pairs, hand-checked totals") {
    val c = NgramLm.bigramCounts(docs, "doc_id", "text")
      .as[(String, String, Long)].collect().toSet
    assert(c === Set(("a", "b", 4L), ("b", "a", 1L), ("b", "c", 1L), ("c", "a", 1L)))
  }

  test("train prunes both tables at minCount; contexts total the FULL counts") {
    val (bg, ctx) = NgramLm.train(docs, "doc_id", "text", minCount = 2)
    assert(bg.as[(String, String, Long)].collect().toSet === Set(("a", "b", 4L)))
    // b's context total (2) survives even though every (b, *) bigram was
    // pruned — denominators come from the unpruned counts.
    assert(ctx.as[(String, Long)].collect().toSet === Set(("a", 4L), ("b", 2L)))
  }

  test("scoreDocs: hand-computed integer costs, OOV flat cost, empty doc keeps a row") {
    val s = NgramLm.perplexityScore(docs, "doc_id", "text", minCount = 2)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(s === Seq(
      // d1: (a,b)=ilog2(5)-ilog2(5)=0 twice; (b,a)=ilog2(3)-ilog2(1)=1
      (1L, 1L, 3L, 333L),
      // d2: (a,b)=0; (b,c): known context, unseen continuation = 1
      (2L, 1L, 2L, 500L),
      // d3: no bigram — present with zeros, not dropped
      (3L, 0L, 0L, 0L),
      // d4: (c,a): context c pruned → OovCost; (a,b)=0
      (4L, NgramLm.OovCost, 2L, NgramLm.OovCost * 1000L / 2L)))
  }

  test("costs are non-negative for every document (c1 >= c2 and OovCost > 0)") {
    val neg = NgramLm.perplexityScore(docs, "doc_id", "text", minCount = 1)
      .where(col("lm_cost") < 0).count()
    assert(neg === 0L)
  }

  test("perplexityFilter keeps the mid band, cuts both tails") {
    val kept = NgramLm.perplexityFilter(docs, "doc_id", "text",
      minBitsPer1k = 1, maxBitsPer1k = 600, minCount = 2)
      .select("doc_id").as[Long].collect().toSet
    // d3 (rate 0, template-flat) and d4 (rate 12000, OOV garbage) cut
    assert(kept === Set(1L, 2L))
  }

  test("contrastScores: the Moore-Lewis delta separates target-like from off-domain docs") {
    // target slice speaks x/y/z bigrams; the rest speaks p/q/r. Both
    // probe docs sit in the general slice, so the target model has never
    // seen doc 14's transitions (flat OOV cost) while doc 13's are its
    // bread and butter — opposite ends of ml_delta.
    val corpus = ((1 to 6).map(i => (i.toLong, "x y x z x y x z", "t")) ++
      (7 to 12).map(i => (i.toLong, "p q p r p q p r", "g")) ++
      Seq((13L, "x y x z", "g"), (14L, "p q p r", "g"))).toDF("doc_id", "text", "lang")
    val out = NgramLm.contrastScores(corpus, "doc_id", "text",
      targetPred = col("lang") === "t", minCount = 1)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r._4).toMap
    // doc 13 (target dialect): cheap under the target model, negative-ish
    // delta; doc 14 (off-domain dialect): the target model has barely seen
    // 'p q', so target bits exceed corpus bits.
    assert(out(13L) < out(14L))
    // deltas are exact integers of the two integer rates
    val full = NgramLm.contrastScores(corpus, "doc_id", "text",
      col("lang") === "t", minCount = 1)
      .as[(Long, Long, Long, Long)].collect()
    assert(full.forall(r => r._4 === r._3 - r._2))
  }

  test("scoring joins the model broadcast — no corpus-sized model shuffle") {
    val plan = NgramLm.perplexityScore(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join in:\n$plan")
  }
}
