package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions.lit

/** Benchmark decontamination: hand-computed n-gram overlaps, the clean-side
  * anti-join, and the broadcast plan shape the 100 TB story rests on.
  */
class DecontaminateSpec extends SparkSpecBase {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "pack my box with five dozen liquor jugs today"),
    (3L, "the quick brown fox runs far away from here"),
    (4L, "completely different content with no shared phrases at all")
  ).toDF("doc_id", "text")

  // One benchmark prompt sharing a 4-gram with docs 1 and 3.
  private val bench = Seq(
    "we ask about the quick brown fox in this question"
  ).toDF("text")

  test("overlaps counts distinct shared n-grams per document") {
    val got = Decontaminate.overlaps(corpus, "doc_id", "text", bench, "text", n = 4)
      .orderBy("doc_id")
      .as[(Long, Long)].collect().toSeq
    // bench 4-grams include "the quick brown fox" and "quick brown fox in" …
    // doc 1 shares only "the quick brown fox" (its next gram is
    // "quick brown fox jumps"); doc 3 likewise; docs 2 and 4 share none.
    assert(got == Seq((1L, 1L), (3L, 1L)))
  }

  test("within-document repeats count once (per-row distinct grams)") {
    val rep = Seq((9L, "alpha beta alpha beta alpha beta")).toDF("doc_id", "text")
    val b = Seq("alpha beta").toDF("text")
    val got = Decontaminate.overlaps(rep, "doc_id", "text", b, "text", n = 2)
      .as[(Long, Long)].collect().toSeq
    // rep's distinct 2-grams: "alpha beta", "beta alpha" — one overlaps.
    assert(got == Seq((9L, 1L)))
  }

  test("clean keeps exactly the unflagged documents") {
    val kept = Decontaminate.clean(corpus, "doc_id", "text", bench, "text", n = 4)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(2L, 4L))
  }

  test("bench gram set joins via broadcast — corpus text never shuffles") {
    val plan = Decontaminate.overlaps(corpus, "doc_id", "text", bench, "text", n = 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("documents shorter than n grams are absent, not zero-counted") {
    val tiny = Seq((7L, "too short")).toDF("doc_id", "text")
    val got = Decontaminate.overlaps(tiny, "doc_id", "text", bench, "text", n = 4)
    assert(got.count() == 0)
  }

  test("fuzzyOverlaps: hand-computed Jaccard, threshold filter, self-pair") {
    val benchIds = Seq((100L, "the quick brown fox jumps over the lazy dog"))
      .toDF("bench_id", "text")
    val got = Decontaminate.fuzzyOverlaps(corpus, "doc_id", "text",
        benchIds, "bench_id", "text", threshold = 0.3, shingleK = 2)
      .orderBy("doc_id")
      .as[(Long, Long, Double)].collect().toSeq
    // doc 1 IS the bench text → jaccard 1.0. doc 3 shares shingles
    // {the quick, quick brown, brown fox} of |A∪B| = 8+8-3 = 13 → 3/13 <
    // 0.3, filtered. docs 2 and 4 share nothing.
    assert(got.map(_._1) == Seq(1L))
    assert(got.head._2 == 100L && got.head._3 == 1.0)
    // At a looser threshold doc 3 appears with exactly 3/13.
    val loose = Decontaminate.fuzzyOverlaps(corpus, "doc_id", "text",
        benchIds, "bench_id", "text", threshold = 0.2, shingleK = 2)
      .orderBy("doc_id")
      .as[(Long, Long, Double)].collect().toSeq
    assert(loose.map(_._1) == Seq(1L, 3L))
    assert(math.abs(loose(1)._3 - 3.0 / 13.0) < 1e-15)
  }

  test("containmentOverlaps flags a bench item quoted in a long doc that Jaccard dilutes") {
    val benchItem = "what is the capital of france and when was it founded exactly"
    val longDoc = s"the model answered many questions that day including $benchItem " +
      "and then went on at extraordinary length about entirely unrelated " +
      "matters of geography history cuisine architecture rivers bridges " +
      "museums trains and the weather in several other countries besides"
    val corpus = Seq((1L, longDoc), (2L, "nothing shared here at all today")).toDF("doc_id", "text")
    val bench = Seq((100L, benchItem)).toDF("bench_id", "text")
    val got = Decontaminate.containmentOverlaps(corpus, "doc_id", "text",
        bench, "bench_id", "text", tau = 0.5)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got.map(p => (p._1, p._2)) == Seq((1L, 100L)))
    assert(got.head._3 >= 0.8, s"expected near-total containment, got ${got.head._3}")
    // Jaccard on the same pair dilutes below a usable threshold
    val jac = Decontaminate.fuzzyOverlaps(corpus, "doc_id", "text",
      bench, "bench_id", "text", threshold = 0.5, shingleK = 2)
    assert(jac.count() == 0)
    // and the clean-side composition drops exactly the containing doc
    val kept = Decontaminate.cleanContainment(corpus, "doc_id", "text",
        bench, "bench_id", "text", tau = 0.5)
      .select("doc_id").as[Long].collect().toSeq
    assert(kept == Seq(2L))
  }

  test("fuzzyOverlaps broadcasts the bench posting side") {
    val plan = Decontaminate.fuzzyOverlaps(corpus, "doc_id", "text",
        bench.withColumn("bench_id", lit(1L)), "bench_id", "text", 0.3, 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("semantic decontamination drops embedding-near rows the text detectors miss") {
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f, 0.05f)),  // near bench 100
      (2L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),   // far from every bench vec
      (3L, Seq(0.95f, 0.05f, 0.0f, 0.0f)), // near bench 100 too
    ).toDF("vec_id", "embedding")
    val bench = Seq(
      (100L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (101L, Seq(0.0f, 0.0f, 1.0f, 0.0f)),
    ).toDF("vec_id", "embedding")
    val flagged = Decontaminate.semanticOverlaps(corpus, "vec_id", "embedding",
        bench, "vec_id", "embedding", threshold = 0.9)
      .select("vec_id", "bench_id").as[(Long, Long)].collect().toSet
    assert(flagged === Set((1L, 100L), (3L, 100L)))
    val kept = Decontaminate.cleanSemantic(corpus, "vec_id", "embedding",
        bench, "vec_id", "embedding", threshold = 0.9)
      .select("vec_id").as[Long].collect().toSeq
    assert(kept === Seq(2L))
    // the broadcast-nested-loop stays on the bench side (corpus streams)
    val plan = Decontaminate.cleanSemantic(corpus, "vec_id", "embedding",
        bench, "vec_id", "embedding", 0.9)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"), plan)
  }
}
