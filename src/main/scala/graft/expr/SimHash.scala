package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{DataType, LongType}

/** 64-bit SimHash (Charikar's locality-sensitive hash for near-duplicate
  * detection, "Similarity estimation techniques from rounding algorithms",
  * STOC 2002): each token hashes to 64 bits; per bit position, set bits vote
  * +1 and clear bits vote -1 across all tokens; the sign of each tally is the
  * corresponding output bit. Documents differing in a few tokens land within
  * small Hamming distance.
  */
object SimHashAlgo {
  /** Same seed as Spark's SQL `xxhash64`, so tests can cross-check tokens. */
  final val Seed = 42L

  /** Codegen/eval entry point over an `array<string>` of tokens. */
  def simhash(tokens: ArrayData): Long = {
    val counters = new Array[Int](64)
    var t = 0
    val n = tokens.numElements()
    while (t < n) {
      if (!tokens.isNullAt(t)) {
        val h = XXH64.hashUTF8String(tokens.getUTF8String(t), Seed)
        var i = 0
        while (i < 64) {
          if (((h >>> i) & 1L) == 1L) counters(i) += 1 else counters(i) -= 1
          i += 1
        }
      }
      t += 1
    }
    var out = 0L
    var i = 0
    while (i < 64) {
      if (counters(i) > 0) out |= (1L << i)
      i += 1
    }
    out
  }

  def hammingDistance(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
}

/** Native Catalyst expression: `array<string>` of tokens → 64-bit SimHash.
  * Codegen is a single static call, keeping the hash inside whole-stage
  * codegen (a higher-order-function composition of the same algorithm needs
  * ~64 nested lambda evaluations per token).
  */
case class SimHash64Expr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "simhash64"
  override def dataType: DataType = LongType

  override protected def nullSafeEval(tokens: Any): Any =
    SimHashAlgo.simhash(tokens.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, arr => s"graft.expr.SimHashAlgo.simhash($arr)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

object SimHash {
  /** `Column` surface: SimHash of a token array column. */
  def simhash64(tokens: Column): Column =
    ColumnShim.column(SimHash64Expr(ColumnShim.expression(tokens)))
}
