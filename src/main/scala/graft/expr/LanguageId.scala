package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused language-ID kernel. The `Column`-algebra formulation re-evaluates
  * the tokenizer inside every score, the `greatest(...)` and each `when`
  * branch — the expression tree duplicates the whole tokenize subtree ~20×
  * per row and common-subexpression elimination does not reach across the
  * conditional branches. One pass here: tokenize once, one hash probe per
  * (token, language), a codepoint scan for the Han ratio, then the pick.
  *
  * Semantics identical to the algebraic form (and the DuckDB oracle):
  * per-language score = profile hits / token count; the alphabetically-last
  * language achieving the max wins ties; `und` below `minScore`; `zh` when
  * Han codepoints exceed 25% of characters.
  */
case class LanguageIdExpr(
    child: Expression,
    profiles: Seq[(String, Seq[String])],
    minScore: Double) extends UnaryExpression {

  override def prettyName: String = "graft_language_id"
  override def dataType: DataType = StringType

  // Sorted language order fixes tie-break priority (last wins).
  @transient private lazy val langs: Array[String] = profiles.map(_._1).sorted.toArray
  @transient private lazy val sets: Array[java.util.HashSet[UTF8String]] = {
    val byName = profiles.toMap
    langs.map { l =>
      val s = new java.util.HashSet[UTF8String]()
      byName(l).foreach(w => s.add(UTF8String.fromString(w)))
      s
    }
  }
  @transient private lazy val langsUtf8: Array[UTF8String] =
    langs.map(UTF8String.fromString)
  @transient private lazy val und = UTF8String.fromString("und")
  @transient private lazy val zh = UTF8String.fromString("zh")

  /** Kernel entry point (also the codegen call target). */
  def evalText(text: UTF8String): UTF8String = {
    val s = text.toString
    // Han codepoint ratio over total codepoints.
    var han = 0
    var chars = 0
    var ci = 0
    while (ci < s.length) {
      val cp = s.codePointAt(ci)
      if (cp >= 0x4e00 && cp <= 0x9fff) han += 1
      chars += 1
      ci += Character.charCount(cp)
    }
    if (chars > 0 && han.toDouble / chars > 0.25) return zh

    val toks = TextShingleAlgo.tokenize(text)
    if (toks.length == 0) return und
    val hits = new Array[Int](langs.length)
    var t = 0
    while (t < toks.length) {
      val tok = UTF8String.fromString(toks(t))
      var l = 0
      while (l < langs.length) {
        if (sets(l).contains(tok)) hits(l) += 1
        l += 1
      }
      t += 1
    }
    var best = -1.0
    var pick = -1
    var l = 0
    while (l < langs.length) {
      val score = hits(l).toDouble / toks.length
      // >= keeps the LAST max in sorted order, matching the fold semantics
      if (score >= best) { best = score; pick = l }
      l += 1
    }
    if (best >= minScore) langsUtf8(pick) else und
  }

  override protected def nullSafeEval(text: Any): Any =
    evalText(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("langIdExpr", this, classOf[LanguageIdExpr].getName)
    defineCodeGen(ctx, ev, t => s"$ref.evalText($t)")
  }

  override protected def withNewChildInternal(newChild: Expression): LanguageIdExpr =
    copy(child = newChild)
}

object LanguageId {
  def languageId(text: Column, profiles: Seq[(String, Seq[String])], minScore: Double): Column =
    ColumnShim.column(LanguageIdExpr(ColumnShim.expression(text), profiles, minScore))
}
