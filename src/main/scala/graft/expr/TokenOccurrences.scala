package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Whole-token term frequency over the space-padded analyzed form
  * ([[graft.store.SearchIndex.analyzedForm]]): the number of times `token`
  * occurs as a complete token in `" tok1 tok2 ... "`.
  *
  * A codegen'd kernel rather than `size(filter(split(...), ...))` because
  * higher-order functions evaluate interpreted per element (measured
  * pitfall in this repo) — BM25 scoring calls this once per query term per
  * row, squarely on the hot path. The scan counts occurrences of
  * `" token "` stepping `pos + len(token) + 1` so adjacent occurrences
  * sharing one boundary space (`" a a a "`) all count; zero-copy over
  * UTF8String bytes.
  */
object TokenAlgo {
  def countToken(padded: UTF8String, pattern: UTF8String, step: Int): Int = {
    var n = 0
    var from = 0
    var pos = padded.indexOf(pattern, from)
    while (pos >= 0) {
      n += 1
      from = pos + step
      pos = padded.indexOf(pattern, from)
    }
    n
  }
}

case class TokenOccurrencesExpr(child: Expression, token: String)
    extends UnaryExpression {

  override def prettyName: String = "token_occurrences"
  override def dataType: DataType = IntegerType

  // " token " with the trailing space reusable as the next leading space.
  private val pattern = UTF8String.fromString(" " + token + " ")
  private val step = UTF8String.fromString(token).numBytes + 1

  override protected def nullSafeEval(s: Any): Any =
    TokenAlgo.countToken(s.asInstanceOf[UTF8String], pattern, step)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pattern", pattern, classOf[UTF8String].getName)
    defineCodeGen(ctx, ev, v => s"graft.expr.TokenAlgo.countToken($v, $ref, $step)")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenOccurrencesExpr =
    copy(child = newChild)
}

object TokenOccurrences {
  /** Count of whole-token occurrences of `token` in a PADDED analyzed
    * column. `token` must already be a single analyzed token (lowercase
    * alphanumeric) — [[graft.expr.TextMatch.analyze]] the raw query first.
    */
  def apply(paddedAnalyzed: Column, token: String): Column = {
    require(token.nonEmpty && token.matches("[a-z0-9]+"),
      s"tokenOccurrences: '$token' is not a single analyzed token")
    ColumnShim.column(TokenOccurrencesExpr(ColumnShim.expression(paddedAnalyzed), token))
  }
}
