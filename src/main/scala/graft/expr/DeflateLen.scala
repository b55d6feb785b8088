package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Deflate-compressed length of a string's UTF-8 bytes — the kernel under
  * [[graft.ops.TextAnalysis.compressionRatio]] (the RedPajama-v2 zlib
  * quality feature). Raw deflate at the default level (6), one Deflater
  * per evaluation (the object is cheap relative to compressing a
  * document, and per-row allocation keeps the expression thread-safe
  * inside whole-stage codegen with zero shared state).
  */
object DeflateLenAlgo {
  def deflateLen(text: UTF8String): Long = {
    val in = text.getBytes
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    try {
      d.setInput(in)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }
}

/** `text → bigint` deflate-compressed byte length (codegen'd). */
case class DeflateLenExpr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "graft_deflate_len"
  override def dataType: DataType = LongType

  override protected def nullSafeEval(text: Any): Any =
    DeflateLenAlgo.deflateLen(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.expr.DeflateLenAlgo.deflateLen($t)")

  override protected def withNewChildInternal(newChild: Expression): DeflateLenExpr =
    copy(child = newChild)
}

object DeflateLen {
  /** Deflate-compressed byte length of `text`. */
  def deflateLength(text: Column): Column =
    ColumnShim.column(DeflateLenExpr(ColumnShim.expression(text)))
}
