package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** BPE merge training on the Sennrich et al. (2016) demo corpus
  * {low×5, lower×2, newest×6, widest×3}, hand-traced:
  *   pairs: (e,s)=9 (s,t)=9 (t,</w>)=9 (w,e)=8 (l,o)=7 (o,w)=7 …
  *   merge 1 = (e,s) 9 (tie broken left-asc), then (es,t) 9,
  *   (est,</w>) 9, (l,o) 7, (lo,w) 7.
  * Plus the shared-delimiter overlap case the two-space encoding exists
  * for, early exhaustion, and inference-side segmentation.
  */
class BpeSpec extends SparkSpecBase {
  import spark.implicits._

  private def docs = {
    val txt = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    Seq((1L, txt)).toDF("doc_id", "text")
  }

  test("wordCounts collapses the corpus to analyzer-word frequencies") {
    val wc = Bpe.wordCounts(docs, "text").as[(String, Long)].collect().toMap
    assert(wc === Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L))
  }

  test("trainMerges reproduces the hand-traced Sennrich merges in order") {
    val m = Bpe.trainMerges(docs, "text", numMerges = 5)
    assert(m === Seq(
      (1, "e", "s", 9L),
      (2, "es", "t", 9L),
      (3, "est", Bpe.EndOfWord, 9L),
      (4, "l", "o", 7L),
      (5, "lo", "w", 7L)))
  }

  test("repeated-symbol runs merge leftmost non-overlapping (the two-space encoding)") {
    val d = Seq((1L, "aaaa aaaa aaa")).toDF("doc_id", "text")
    val m = Bpe.trainMerges(d, "text", numMerges = 1)
    // counting is Sennrich's get_stats — every adjacent pair, overlapping:
    // aaaa has 3 (a,a), aaa has 2 → 3*2 + 2 = 8. Only REPLACEMENT is
    // leftmost non-overlapping (the next assertion).
    assert(m === Seq((1, "a", "a", 8L)))
    val seg = Bpe.segmentWords(Seq(("aaaa"), ("aaa")).toDF("word"), "word", m)
      .select("pieces").as[Seq[String]].collect().toSeq
    assert(seg === Seq(
      Seq("aa", "aa", Bpe.EndOfWord),
      Seq("aa", "a", Bpe.EndOfWord)))
  }

  test("training stops when no pair reaches minPairCount") {
    val m = Bpe.trainMerges(docs, "text", numMerges = 50, minPairCount = 7L)
    // only the count-9 and count-7 merges exist at threshold 7: after
    // (e,s)(es,t)(est,</w>)(l,o)(lo,w), best remaining is (n,e)=6 < 7.
    // (low,</w>) re-forms at 5 — still under.
    assert(m.map(x => (x._2, x._3, x._4)) === Seq(
      ("e", "s", 9L), ("es", "t", 9L), ("est", Bpe.EndOfWord, 9L),
      ("l", "o", 7L), ("lo", "w", 7L)))
  }

  test("segmentWords applies the merge table in rank order (lowest -> low + est</w>)") {
    val m = Bpe.trainMerges(docs, "text", numMerges = 5)
    val seg = Bpe.segmentWords(Seq(("lowest"), ("newest"), ("x")).toDF("word"), "word", m)
      .select("word", "pieces").as[(String, Seq[String])].collect().toMap
    assert(seg("lowest") === Seq("low", "est" + Bpe.EndOfWord))
    assert(seg("newest") === Seq("n", "e", "w", "est" + Bpe.EndOfWord))
    assert(seg("x") === Seq("x", Bpe.EndOfWord))
  }

  test("tokenCounts: learned-BPE token budget per doc; empty docs keep a zero row") {
    val m = Bpe.trainMerges(docs, "text", numMerges = 5)
    // low -> [low </w>]=2; lower -> [low e r </w>]=4; lowest -> [low est</w>]=2
    val d = Seq((1L, "low lower lowest"), (2L, ""), (3L, "low low")).toDF("doc_id", "text")
    val tc = Bpe.tokenCounts(d, "doc_id", "text", m)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(tc === Seq((1L, 8L), (2L, 0L), (3L, 4L)))
  }
}
