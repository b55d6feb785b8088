package graft.expr

import graft.SparkSpecBase
import graft.ops.TextAnalysis
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Pins the repetition kernel ([[GramStatsAlgo]]) and the Gopher-style
  * fractions derived from it — hand-computed fixtures, including the
  * multi-line path the single-line bench corpus never exercises.
  */
class GramStatsSpec extends SparkSpecBase {
  import spark.implicits._

  private def stats(text: String, n: Int): Row =
    Seq(text).toDF("t")
      .select(GramStats(TextShingles.tokenize(col("t")), n).as("s"))
      .head().getStruct(0)

  test("2-gram stats on a repeated bigram") {
    // tokens [a, b, a, b, c] → grams "a b"×2, "b a", "b c"
    val s = stats("a b a b c", 2)
    assert(s.getLong(0) == 4L)  // total
    assert(s.getLong(1) == 8L)  // total_chars: 4 grams × 2 chars
    assert(s.getLong(2) == 2L)  // dup_occurrences: both "a b"
    assert(s.getLong(3) == 4L)  // dup_chars
    assert(s.getLong(4) == 2L)  // top_count
    assert(s.getLong(5) == 2L)  // top_chars
  }

  test("tie-break picks larger chars, then byte-order-smallest gram") {
    // All grams unique: "xx y", "y zz", "zz w" — chars 3, 3, 3? No:
    // token chars only: "xx y"→3, "y zz"→3, "zz w"→3; full tie → smallest
    // gram "xx y"... byte order: 'x' > 'y'? no: 'x'(0x78) < 'y'(0x79) <
    // 'z'(0x7a), so "xx y" wins.
    val s = stats("xx y zz w", 2)
    assert(s.getLong(4) == 1L)
    assert(s.getLong(5) == 3L)
    // chars tie-break: [ab, c, ab] → "ab c"(3 chars), "c ab"(3) — tie on
    // count and chars, byte-smallest is "ab c".
    val s2 = stats("ab c ab", 2)
    assert(s2.getLong(4) == 1L && s2.getLong(5) == 3L)
    // count wins over chars: [a b a b zzzz] has "a b"×2 (2 chars) beating
    // "b zzzz" (5 chars, ×1).
    val s3 = stats("a b a b zzzz", 2)
    assert(s3.getLong(4) == 2L && s3.getLong(5) == 2L)
  }

  test("fewer than n tokens yields all zeros") {
    val s = stats("one two", 5)
    assert((0 until 6).forall(s.getLong(_) == 0L))
    val e = stats("", 2)
    assert((0 until 6).forall(e.getLong(_) == 0L))
  }

  test("lines splits, trims, and drops empties") {
    val lines = Seq("hello world\nhello world\n\n  foo  \n").toDF("t")
      .select(GramStats.lines(col("t")).as("l"))
      .head().getSeq[String](0)
    assert(lines == Seq("hello world", "hello world", "foo"))
  }

  test("lines handles CRLF and tab padding with the oracle's exact trim set") {
    // CRLF endings trim away; a lone \r line is empty; tabs pad-trim.
    val lines = Seq("foo\r\nfoo\r\n\r\n\tbar\t\n").toDF("t")
      .select(GramStats.lines(col("t")).as("l"))
      .head().getSeq[String](0)
    assert(lines == Seq("foo", "foo", "bar"))
    // dup fractions on CRLF text: both 'foo' lines count as duplicates
    val f = Seq("foo\r\nfoo\r\nbar").toDF("text")
      .select(graft.ops.TextAnalysis.dupLineFrac(col("text"))).head().getDouble(0)
    assert(math.abs(f - 2.0 / 3.0) < 1e-12)
  }

  test("line-level duplication fractions (n = 1 over lines)") {
    val df = Seq("hello world\nhello world\n\n  foo  \n").toDF("text")
    val r = df.select(
      TextAnalysis.dupLineFrac(col("text")).as("f"),
      TextAnalysis.dupLineCharFrac(col("text")).as("cf")).head()
    assert(math.abs(r.getDouble(0) - 2.0 / 3.0) < 1e-12)
    // chars: 11 + 11 + 3 = 25 total, 22 duplicated
    assert(math.abs(r.getDouble(1) - 22.0 / 25.0) < 1e-12)
    // single-line and empty documents score 0
    val z = Seq("just one line", "").toDF("text")
      .select(TextAnalysis.dupLineFrac(col("text")).as("f"),
        TextAnalysis.dupLineCharFrac(col("text")).as("cf"))
      .collect()
    assert(z.forall(r => r.getDouble(0) == 0.0 && r.getDouble(1) == 0.0))
  }

  test("top-n-gram and dup-n-gram character fractions") {
    val df = Seq("a b a b c").toDF("text")
    val top2 = df.select(TextAnalysis.topNGramCharFrac(col("text"), 2)).head().getDouble(0)
    assert(math.abs(top2 - 4.0 / 5.0) < 1e-12) // mass 2×2 over 5 alnum chars
    // "a b c d e a b c d e": the repeated 5-gram covers all 10 chars
    val df5 = Seq("a b c d e a b c d e").toDF("text")
    val dup5 = df5.select(TextAnalysis.dupNGramCharFrac(col("text"), 5)).head().getDouble(0)
    assert(math.abs(dup5 - 1.0) < 1e-12)
    // no repetition → dup fraction 0
    val none = Seq("one two three four five six").toDF("text")
      .select(TextAnalysis.dupNGramCharFrac(col("text"), 5)).head().getDouble(0)
    assert(none == 0.0)
  }

  test("repetitionProfile emits the five named signal columns") {
    val df = Seq((1L, "spam spam spam spam")).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionProfile(df, "text")
    assert(out.columns.toSeq.takeRight(5) == Seq("top2gram_char_frac",
      "top3gram_char_frac", "dup5gram_char_frac", "dup_line_frac", "dup_line_char_frac"))
    val r = out.head()
    // "spam spam"×3 of 3 bigrams, 8 chars each occurrence, 16 alnum chars:
    // top2 = 3×8/16 = 1.5 (overlap re-counts — documented Gopher behavior)
    assert(math.abs(r.getAs[Double]("top2gram_char_frac") - 1.5) < 1e-12)
  }
}
