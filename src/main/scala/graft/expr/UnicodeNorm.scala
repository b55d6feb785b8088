package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization + control-character cleanup — the text-
  * normalization stage every tokenizer pipeline runs first (HuggingFace
  * normalizers, SentencePiece's NFKC option, CCNet's cleanup): combining
  * sequences compose to their canonical precomposed forms (`e` +
  * U+0301 → `é`), so byte-level dedup/fingerprint/vocab stages see ONE
  * encoding per grapheme instead of every source's historical choice, and
  * C0 control characters (except tab/newline/carriage-return) plus DEL
  * are stripped. C1 codepoints (U+0080–U+009F) deliberately pass through:
  * they are legal (if rare) text the caller may still want, and the
  * DuckDB oracle's strip regex draws the same line — extend [[keep]] AND
  * the oracle together if a pipeline needs C1 removal.
  *
  * Cross-engine contract: the result equals DuckDB's `nfc_normalize` over
  * the same control-stripped text (both implement Unicode canonical
  * composition, which is versioned but stable for assigned codepoints) —
  * what lets `text_normalize` hash-match its oracle. NFC (not NFKC) on
  * purpose: canonical composition is lossless; compatibility folding
  * (ligatures, superscripts) changes content and is a policy decision a
  * pipeline should opt into explicitly.
  *
  * Scale shape: row-local, codegen'd, zero shuffle at any corpus size —
  * the same contract as every expression in this package.
  */
object UnicodeNormAlgo {

  /** Keep a char? C0 controls except \t \n \r are dropped, as is DEL
    * (0x7F). Everything ≥ 0x80 (including C1 bytes, which in valid UTF-8
    * strings are continuation data at the char level only as real C1
    * codepoints) passes to the normalizer untouched.
    */
  @inline private def keep(c: Char): Boolean =
    c >= 0x20 && c != 0x7f || c == '\t' || c == '\n' || c == '\r'

  def nfcClean(text: UTF8String): UTF8String = {
    val s = text.toString
    var i = 0
    var dirty = false
    while (i < s.length && !dirty) { dirty = !keep(s.charAt(i)); i += 1 }
    val cleaned: CharSequence =
      if (!dirty) s
      else {
        val sb = new java.lang.StringBuilder(s.length)
        var j = 0
        while (j < s.length) {
          val c = s.charAt(j)
          if (keep(c)) sb.append(c)
          j += 1
        }
        sb
      }
    // the common case (already-NFC ASCII/Latin text) is a no-op the
    // normalizer detects in one linear scan
    if (java.text.Normalizer.isNormalized(cleaned, java.text.Normalizer.Form.NFC)
        && !dirty) text
    else UTF8String.fromString(
      java.text.Normalizer.normalize(cleaned, java.text.Normalizer.Form.NFC))
  }
}

/** `text → text` NFC-normalized, control-stripped (codegen'd). */
case class NfcCleanExpr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "graft_nfc_clean"
  override def dataType: DataType = StringType

  override protected def nullSafeEval(text: Any): Any =
    UnicodeNormAlgo.nfcClean(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.expr.UnicodeNormAlgo.nfcClean($t)")

  override protected def withNewChildInternal(newChild: Expression): NfcCleanExpr =
    copy(child = newChild)
}

object UnicodeNorm {
  /** NFC-normalized, control-stripped text. */
  def nfcClean(text: Column): Column =
    ColumnShim.column(NfcCleanExpr(ColumnShim.expression(text)))
}
