package graft.query

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** RRF fusion: hand-computed scores, missing-run semantics, tie-breaks,
  * and run-order determinism.
  */
class HybridSpec extends SparkSpecBase {
  import spark.implicits._

  private val lexical = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("id", "rank")
  private val vector = Seq((20L, 1), (40L, 2), (10L, 3)).toDF("id", "rank")

  test("rrf sums 1/(k+rank) across runs, hand-computed") {
    val got = Hybrid.rrf(Seq(lexical, vector), "id", "rank", rrfK = 60, topK = 10)
      .as[(Long, Double)].collect().toMap
    assert(math.abs(got(20L) - (1.0 / 62 + 1.0 / 61)) < 1e-15)
    assert(math.abs(got(10L) - (1.0 / 61 + 1.0 / 63)) < 1e-15)
    assert(math.abs(got(30L) - 1.0 / 63) < 1e-15)
    assert(math.abs(got(40L) - 1.0 / 62) < 1e-15)
  }

  test("doc in both runs outranks a doc in one run at better rank") {
    val got = Hybrid.rrf(Seq(lexical, vector), "id", "rank", topK = 10)
      .as[(Long, Double)].collect().toSeq
    // 20 (ranks 2+1) and 10 (ranks 1+3) beat every single-run doc.
    assert(got.take(2).map(_._1).toSet == Set(10L, 20L))
    assert(got.head._1 == 20L) // 1/62+1/61 > 1/61+1/63
  }

  test("topK truncates and ties break by ascending id") {
    val a = Seq((1L, 1), (2L, 2)).toDF("id", "rank")
    val b = Seq((2L, 1), (1L, 2)).toDF("id", "rank") // symmetric → tie
    val got = Hybrid.rrf(Seq(a, b), "id", "rank", topK = 1)
      .as[(Long, Double)].collect().toSeq
    assert(got.map(_._1) == Seq(1L))
  }

  test("withRank ranks by score desc then id asc") {
    val run = Seq((5L, 0.9), (6L, 0.9), (7L, 1.5)).toDF("id", "score")
    val got = Hybrid.withRank(run, "score", "id")
      .select("id", "rank").as[(Long, Int)].collect().toMap
    assert(got == Map(7L -> 1, 5L -> 2, 6L -> 3))
  }

  test("withRank refuses a corpus-sized run in-plan") {
    val big = (1 to 20).map(i => (i.toLong, i / 100.0)).toDF("id", "score")
    val e = intercept[Exception] {
      Hybrid.withRank(big, "score", "id", maxRows = 5).collect()
    }
    assert(e.getMessage.contains("exceed maxRows=5"))
    assert(Hybrid.withRank(big, "score", "id").count() === 20)
  }

  test("single run degenerates to rank order") {
    val got = Hybrid.rrf(Seq(lexical), "id", "rank", topK = 10)
      .as[(Long, Double)].collect().toSeq.map(_._1)
    assert(got == Seq(10L, 20L, 30L))
  }

  test("linearFusion: per-run min-max, weighted sum, absent docs contribute 0") {
    val a = Seq((1L, 10.0), (2L, 5.0), (3L, 0.0)).toDF("id", "score")
    val b = Seq((2L, 2.0), (4L, 1.0)).toDF("id", "score")
    val got = Hybrid.linearFusion(Seq(a -> 0.7, b -> 0.3), "id", "score", topK = 10)
      .as[(Long, Double)].collect().toMap
    // run a normalizes 10→1, 5→0.5, 0→0; run b: 2→1, 1→0
    assert(got(1L) === 0.7 * 1.0)
    assert(got(2L) === 0.7 * 0.5 + 0.3 * 1.0)
    assert(got(3L) === 0.0)
    assert(got(4L) === 0.0) // 0.3 * 0 — the run's minimum
    // degenerate run (all scores equal) normalizes to 1.0
    val c = Seq((7L, 4.0), (8L, 4.0)).toDF("id", "score")
    val deg = Hybrid.linearFusion(Seq(c -> 0.5), "id", "score", topK = 10)
      .as[(Long, Double)].collect().toMap
    assert(deg(7L) === 0.5 && deg(8L) === 0.5)
  }

  test("pinned: curated order first, organic follows deduped, rank dense") {
    val organic = Seq((10L, 9.0), (20L, 8.0), (30L, 7.0), (40L, 6.0))
      .toDF("id", "score")
    val got = Hybrid.pinned(organic, "id", "score",
        pinnedIds = Seq(30L, 99L), topK = 10)
      .as[(Long, Int, Boolean)].collect().sortBy(_._2).toSeq
    // 30 promoted to rank 1 (out of its organic slot), 99 surfaces even
    // though the organic run never returned it (no corpus to check
    // against — the documented trust-the-list divergence), then organic
    // minus pinned
    assert(got === Seq((30L, 1, true), (99L, 2, true),
      (10L, 3, false), (20L, 4, false), (40L, 5, false)))
    intercept[IllegalArgumentException](
      Hybrid.pinned(organic, "id", "score", Seq(1L, 1L), 10))
  }

  test("pinned with corpus: stale ids drop, ranks compact, offset follows survivors") {
    val organic = Seq((10L, 9.0), (20L, 8.0), (30L, 7.0), (40L, 6.0))
      .toDF("id", "score")
    val corpus = Seq(10L, 20L, 30L, 40L, 50L).toDF("id")
    // 99 is NOT in the corpus — the ES contract drops it; 50 IS in the
    // corpus though never returned organically — it still promotes
    val got = Hybrid.pinned(organic, "id", "score",
        pinnedIds = Seq(30L, 99L, 50L), topK = 10, corpus = Some(corpus))
      .as[(Long, Int, Boolean)].collect().sortBy(_._2).toSeq
    assert(got === Seq((30L, 1, true), (50L, 2, true),
      (10L, 3, false), (20L, 4, false), (40L, 5, false)))
  }

  test("rescore: only the window recombines; the tail keeps primary order below it") {
    val primary = Seq((1L, 10.0), (2L, 9.0), (3L, 8.0), (4L, 7.0))
      .toDF("id", "score")
    val secondary = Seq((2L, 5.0), (4L, 100.0)).toDF("id", "s2")
    val got = Hybrid.rescore(primary, "id", "score", secondary, "s2",
        windowSize = 2, queryWeight = 1.0, rescoreWeight = 1.0)
      .as[(Long, Int, Double)].collect().sortBy(_._2).toSeq
    // window {1, 2}: 2 gains the boost (9+5=14) and overtakes 1 (10+0);
    // 4's huge secondary is IGNORED — it sits below the window, and the
    // tail keeps primary order BELOW every window doc
    assert(got === Seq((2L, 1, 14.0), (1L, 2, 10.0), (3L, 3, 8.0), (4L, 4, 7.0)))
    intercept[IllegalArgumentException](
      Hybrid.rescore(primary, "id", "score", secondary, "s2", windowSize = 0))
  }

  test("rescore pre-limits the run to runLimit before the global window") {
    val primary = Seq((1L, 10.0), (2L, 9.0), (3L, 8.0), (4L, 7.0))
      .toDF("id", "score")
    val secondary = Seq((2L, 5.0)).toDF("id", "s2")
    // runLimit=3: doc 4 (primary rank 4) truncates out entirely — the
    // page-budget bound that keeps an unbounded serving match set from
    // funneling through the one-partition rank window
    val got = Hybrid.rescore(primary, "id", "score", secondary, "s2",
        windowSize = 2, runLimit = 3)
      .as[(Long, Int, Double)].collect().sortBy(_._2).toSeq
    assert(got === Seq((2L, 1, 14.0), (1L, 2, 10.0), (3L, 3, 8.0)))
    // the rescored window must survive the cut
    intercept[IllegalArgumentException](
      Hybrid.rescore(primary, "id", "score", secondary, "s2",
        windowSize = 5, runLimit = 3))
  }

  test("rescore CONTRACT: secondary must be per-id unique (duplicates fan out)") {
    // The r18 single-reference form left-joins `secondary` against ALL
    // bounded rows, so a duplicate-id secondary fans out TAIL rows too —
    // this pin makes the widened per-id-unique contract load-bearing
    // instead of implicit (r18 advice item). Every in-repo caller passes
    // a per-id-unique secondary (scores are one row per doc); if this
    // test starts failing because rescore learned to dedup internally,
    // update the contract note in Hybrid.rescore's scaladoc.
    val primary = Seq((1L, 10.0), (2L, 9.0), (3L, 8.0)).toDF("id", "score")
    val dupSecondary = Seq((3L, 1.0), (3L, 2.0)).toDF("id", "s2")
    val rows = Hybrid.rescore(primary, "id", "score", dupSecondary, "s2",
        windowSize = 1)
      .as[(Long, Int, Double)].collect().toSeq
    // tail doc 3 joined both duplicate rows: 4 output rows for 3 docs —
    // the documented fan-out, NOT silent dedup
    assert(rows.length === 4 && rows.count(_._1 == 3L) === 2)
  }
}
