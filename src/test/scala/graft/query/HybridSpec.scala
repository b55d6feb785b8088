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
}
