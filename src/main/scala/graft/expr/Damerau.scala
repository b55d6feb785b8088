package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** FULL (unrestricted) Damerau–Levenshtein distance — the Lowrance–Wagner
  * 1975 algorithm with the last-occurrence table, NOT the cheaper
  * optimal-string-alignment restriction (`OSA("ca","abc") = 3` where the
  * true distance is 2: `ca → ac → abc`). ES's `fuzziness` counts
  * transpositions as one edit (its `transpositions: true` default); this
  * expression closes that documented delta, and DuckDB's
  * `damerau_levenshtein` implements the SAME unrestricted variant
  * (probed: `('ca','abc') = 2`), so the predicate restates cross-engine.
  *
  * Char-level (UTF-16 code units) — exact for the analyzers' `[a-z0-9]+`
  * token alphabet and all of BMP; supplementary-plane text would count
  * surrogate pairs as two units (documented; the corpus analyzers never
  * emit them).
  */
object DamerauAlgo {
  def distance(a: UTF8String, b: UTF8String): Int = {
    val s = a.toString
    val t = b.toString
    val n = s.length
    val m = t.length
    if (n == 0) return m
    if (m == 0) return n
    val inf = n + m
    val da = new java.util.HashMap[Character, Integer]()
    val d = Array.ofDim[Int](n + 2, m + 2)
    d(0)(0) = inf
    var i = 0
    while (i <= n) { d(i + 1)(0) = inf; d(i + 1)(1) = i; i += 1 }
    var j = 0
    while (j <= m) { d(0)(j + 1) = inf; d(1)(j + 1) = j; j += 1 }
    i = 1
    while (i <= n) {
      var db = 0
      j = 1
      while (j <= m) {
        val i1: Int = { val v = da.get(t.charAt(j - 1)); if (v == null) 0 else v }
        val j1 = db
        var cost = 1
        if (s.charAt(i - 1) == t.charAt(j - 1)) { cost = 0; db = j }
        val sub = d(i)(j) + cost
        val ins = d(i + 1)(j) + 1
        val del = d(i)(j + 1) + 1
        val trans = d(i1)(j1) + (i - i1 - 1) + 1 + (j - j1 - 1)
        d(i + 1)(j + 1) = math.min(math.min(sub, math.min(ins, del)), trans)
        j += 1
      }
      da.put(s.charAt(i - 1), i)
      i += 1
    }
    d(n + 1)(m + 1)
  }
}

case class DamerauLevenshteinExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "damerau_levenshtein"
  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(l: Any, r: Any): Any =
    DamerauAlgo.distance(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) => s"graft.expr.DamerauAlgo.distance($l, $r)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DamerauLevenshteinExpr =
    copy(left = newLeft, right = newRight)
}

object Damerau {
  /** Full Damerau–Levenshtein distance between two string columns. */
  def distance(a: Column, b: Column): Column =
    ColumnShim.column(DamerauLevenshteinExpr(
      ColumnShim.expression(a), ColumnShim.expression(b)))
}
