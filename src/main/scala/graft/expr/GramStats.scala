package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Within-document repetition statistics — the kernel behind Gopher-style
  * quality signals (duplicate-line fraction, top-n-gram character fraction,
  * duplicated-n-gram character fraction; Rae et al. 2021, public paper).
  *
  * One pass per row, no shuffle: repetition is a PER-DOCUMENT property, so
  * the scalable shape is a row-local kernel inside whole-stage codegen —
  * the corpus-wide alternative (explode grams → groupBy (doc, gram)) moves
  * every token of 100 TB through an exchange to compute values that never
  * leave the row. Cost is O(G log G) per row (sort + one run-scan), G =
  * gram count.
  *
  * Input is any `array<string>` frame — word n-grams over the analyzer's
  * tokens (`n ≥ 2`), or trimmed non-empty lines with `n = 1` (gram = line).
  * Output struct (all BIGINT, exact under any plan):
  *   - `total`        occurrence count of n-grams (`max(0, L − n + 1)`)
  *   - `total_chars`  Σ over occurrences of the gram's character length
  *                    (element codepoints only; the single-space joins the
  *                    gram key carries are excluded)
  *   - `dup_occurrences` / `dup_chars`  same sums restricted to grams
  *                    occurring more than once (ALL their occurrences)
  *   - `top_count` / `top_chars`  occurrence count and character length of
  *                    the most frequent gram; ties break to the larger
  *                    character length, then the byte-order-smallest gram
  *                    (binary collation — matches DuckDB's default, so the
  *                    oracle's `ORDER BY cnt DESC, chars DESC, gram ASC
  *                    LIMIT 1` restates the pick exactly)
  */
object GramStatsAlgo {

  val dataType: StructType = StructType(Seq(
    StructField("total", LongType, nullable = false),
    StructField("total_chars", LongType, nullable = false),
    StructField("dup_occurrences", LongType, nullable = false),
    StructField("dup_chars", LongType, nullable = false),
    StructField("top_count", LongType, nullable = false),
    StructField("top_chars", LongType, nullable = false)))

  /** Kernel entry point (also the codegen call target). */
  def compute(arr: ArrayData, n: Int): InternalRow = {
    val len = arr.numElements()
    val total = if (n < 1) 0 else len - n + 1
    if (total <= 0) return new GenericInternalRow(Array[Any](0L, 0L, 0L, 0L, 0L, 0L))

    // Materialize gram keys (n elements joined by single spaces; n = 1 is
    // the element itself, zero-copy). UTF8String.compareTo is unsigned byte
    // order — the binary collation the oracle's ORDER BY uses.
    val grams = new Array[UTF8String](total)
    var i = 0
    while (i < total) {
      if (n == 1) grams(i) = arr.getUTF8String(i)
      else {
        val sb = new java.lang.StringBuilder(32)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(arr.getUTF8String(i + j).toString)
          j += 1
        }
        grams(i) = UTF8String.fromString(sb.toString)
      }
      i += 1
    }
    java.util.Arrays.sort(grams, null) // Comparable: unsigned byte order

    var totalChars = 0L
    var dupOcc = 0L
    var dupChars = 0L
    var topCount = 0L
    var topChars = 0L
    var runStart = 0
    while (runStart < total) {
      var runEnd = runStart + 1
      while (runEnd < total && grams(runEnd).equals(grams(runStart))) runEnd += 1
      val cnt = (runEnd - runStart).toLong
      val chars = grams(runStart).numChars().toLong - (n - 1).toLong
      totalChars += cnt * chars
      if (cnt > 1) { dupOcc += cnt; dupChars += cnt * chars }
      // Strict comparisons keep the FIRST (byte-order-smallest) gram on
      // full (count, chars) ties — the sort visits grams ascending.
      if (cnt > topCount || (cnt == topCount && chars > topChars)) {
        topCount = cnt
        topChars = chars
      }
      runStart = runEnd
    }
    new GenericInternalRow(Array[Any](
      total.toLong, totalChars, dupOcc, dupChars, topCount, topChars))
  }

  /** Trimmed non-empty lines of `text` — the `n = 1` frame for line-level
    * repetition. The trim set is EXACTLY `{space, tab, CR}` (so CRLF text
    * behaves, and a lone `"\r"` line drops as empty) — deliberately NOT
    * Java `String.trim`, whose "all codepoints ≤ U+0020" rule has no
    * finite-charset SQL restatement; the oracle mirrors this as
    * `trim(x, ' ' || chr(9) || chr(13))`.
    */
  def lines(text: UTF8String): ArrayData = {
    val s = text.toString
    def isPad(c: Char): Boolean = c == ' ' || c == '\t' || c == '\r'
    val out = new scala.collection.mutable.ArrayBuffer[AnyRef](8)
    var start = 0
    val n = s.length
    var i = 0
    while (i <= n) {
      if (i == n || s.charAt(i) == '\n') {
        var lo = start
        var hi = i
        while (lo < hi && isPad(s.charAt(lo))) lo += 1
        while (hi > lo && isPad(s.charAt(hi - 1))) hi -= 1
        if (hi > lo) out += UTF8String.fromString(s.substring(lo, hi))
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** `(array<string>, n) → repetition-stats struct` (codegen'd). */
case class GramStatsExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "graft_gram_stats"
  override def dataType: DataType = GramStatsAlgo.dataType

  override protected def nullSafeEval(arr: Any, n: Any): Any =
    GramStatsAlgo.compute(arr.asInstanceOf[ArrayData], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, n) => s"graft.expr.GramStatsAlgo.compute($a, $n)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): GramStatsExpr =
    copy(left = l, right = r)
}

/** `text → array<string>` trimmed non-empty lines (codegen'd). */
case class LinesExpr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "graft_lines"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(text: Any): Any =
    GramStatsAlgo.lines(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.expr.GramStatsAlgo.lines($t)")

  override protected def withNewChildInternal(newChild: Expression): LinesExpr =
    copy(child = newChild)
}

object GramStats {
  import org.apache.spark.sql.functions.lit

  /** Repetition statistics of consecutive `n`-grams over a string array. */
  def apply(arr: Column, n: Int): Column =
    ColumnShim.column(GramStatsExpr(
      ColumnShim.expression(arr), ColumnShim.expression(lit(n))))

  /** Trimmed non-empty lines of a text column. */
  def lines(text: Column): Column =
    ColumnShim.column(LinesExpr(ColumnShim.expression(text)))
}
