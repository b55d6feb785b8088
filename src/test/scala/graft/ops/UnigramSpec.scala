package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Unigram (SentencePiece-style) Viterbi segmentation: hand-computed
  * vocabulary costs and DP values, the coverage fallback, zero-token
  * documents, and the length guard.
  */
class UnigramSpec extends SparkSpecBase {
  import spark.implicits._

  test("segmentCounts: hand-computed piece costs and Viterbi optima") {
    // words: 'aaab' occ 3, 'ab' occ 1. Weighted substring counts (≤3):
    // a=10 b=4 aa=6 ab=4 aaa=3 aab=3 → total 30, ilog2(31)=5
    // costs: a=1, b=2, aa=2, ab=2, aaa=2, aab=2
    // 'aaab' optimum: a + aab = cost 3, 2 pieces (beats aaa+b / aa+ab = 4)
    // 'ab' optimum: ab = cost 2, 1 piece
    val docs = Seq(
      (1L, "aaab"), (2L, "ab"), (3L, "aaab aaab"), (4L, ""),
    ).toDF("doc_id", "text")
    val out = Unigram.segmentCounts(docs, "doc_id", "text",
      maxPieceLen = 3, minCount = 2, maxWordLen = 8)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out === Seq(
      (1L, 2L, 3L),  // a + aab
      (2L, 1L, 2L),  // ab
      (3L, 4L, 6L),  // two occurrences of aaab
      (4L, 0L, 0L))) // no tokens, row kept
  }

  test("tiebreak prefers fewer pieces at equal cost; coverage segments any word") {
    // every piece cost equal ⇒ the packed +1-per-piece term decides:
    // 'abab' must take 2×'ab', never 4 chars
    val docs = Seq((1L, "abab abab ab ab a a b b")).toDF("doc_id", "text")
    val out = Unigram.segmentCounts(docs, "doc_id", "text",
      maxPieceLen = 2, minCount = 2, maxWordLen = 8)
      .as[(Long, Long, Long)].head()
    // abab→2 pieces ×2, ab→1 ×2, a→1 ×2, b→1 ×2 = 10 pieces total
    assert(out._2 === 10L)
    // a word whose multi-char substrings are all pruned still segments
    // into single characters (the coverage guarantee)
    val rare = Seq((1L, "xyz"), (2L, "common common common")).toDF("doc_id", "text")
    val seg = Unigram.segmentCounts(rare, "doc_id", "text",
      maxPieceLen = 3, minCount = 3, maxWordLen = 8)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(seg(0)._2 === 3L) // x|y|z — chars always in vocabulary
  }

  test("segmentPieces reconstructs the optimal segmentation, consistent with the counts form") {
    val docs = Seq(
      (1L, "aaab"), (2L, "ab"), (3L, "aaab aaab"), (4L, ""),
    ).toDF("doc_id", "text")
    val pieces = Unigram.segmentPieces(docs, "doc_id", "text",
      maxPieceLen = 3, minCount = 2, maxWordLen = 8)
      .as[(Long, Seq[String])].collect().sortBy(_._1).toSeq
    // hand values: aaab -> a|aab (cost 3, longest-last on the tie path),
    // ab -> ab
    assert(pieces === Seq(
      (1L, Seq("a", "aab")),
      (2L, Seq("ab")),
      (3L, Seq("a", "aab", "a", "aab")),
      (4L, Seq.empty)))
    // consistency with the counts form on the real corpus: piece counts
    // equal uni_tokens and pieces rejoin to the analyzed words
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(50)
    val p = Unigram.segmentPieces(corpus, "doc_id", "text", maxWordLen = 16)
      .as[(Long, Seq[String])].collect().toMap
    val c = Unigram.segmentCounts(corpus, "doc_id", "text", maxWordLen = 16)
      .as[(Long, Long, Long)].collect()
    for ((id, toks, _) <- c)
      assert(p(id).size.toLong === toks, s"doc $id piece count drifted")
    val words = corpus.select(col("doc_id"),
        concat_ws("", split(trim(graft.expr.TextMatch.normalized(col("text"))), " ")))
      .as[(Long, String)].collect().toMap
    for ((id, ps) <- p)
      assert(ps.mkString("") === words(id), s"doc $id pieces do not rejoin")
  }

  test("words longer than maxWordLen fail loudly in-plan") {
    val docs = Seq((1L, "a" * 40)).toDF("doc_id", "text")
    val e = intercept[Exception](
      Unigram.segmentCounts(docs, "doc_id", "text", maxWordLen = 16).collect())
    assert(e.getMessage.contains("maxWordLen"))
  }
}
