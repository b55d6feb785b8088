package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Primitive-array vector kernels for the similarity operators.
  *
  * The higher-order-function formulation (`aggregate(zip_with(...))`) walks
  * `ArrayData` element-by-element through Catalyst's generic eval path and
  * allocates an intermediate array per pair — measurable at
  * |corpus|² pair volume. These kernels copy each array once into a primitive
  * `double[]` and run a fused multiply-add loop, invoked inline from
  * whole-stage codegen.
  *
  * Summation order is sequential (index 0..n-1), matching DuckDB's
  * `list_inner_product` fold so oracle comparisons agree bit-for-bit.
  */
object VectorAlgo {
  def dot(a: ArrayData, b: ArrayData): Double = {
    val x = a.toDoubleArray()
    val y = b.toDoubleArray()
    val n = math.min(x.length, y.length)
    var s = 0.0
    var i = 0
    while (i < n) { s += x(i) * y(i); i += 1 }
    s
  }

  /** cosine(a, b) = a·b / (‖a‖ ‖b‖), one pass over both arrays; 0 when either
    * norm is 0 (degenerate vectors never count as similar).
    */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val x = a.toDoubleArray()
    val y = b.toDoubleArray()
    val n = math.min(x.length, y.length)
    var d = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      d += x(i) * y(i)
      na += x(i) * x(i)
      nb += y(i) * y(i)
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else d / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Σ aᵢ, sequential order (matches SQL `list_sum`'s fold). */
  def sum(a: ArrayData): Double = {
    val x = a.toDoubleArray()
    var s = 0.0
    var i = 0
    while (i < x.length) { s += x(i); i += 1 }
    s
  }

  /** Elementwise a − b (IVF-PQ residual vectors). Each lane is one IEEE
    * subtraction — bit-identical to any engine's elementwise restatement.
    */
  def sub(a: ArrayData, b: ArrayData): ArrayData = {
    val x = a.toDoubleArray()
    val y = b.toDoubleArray()
    val n = math.min(x.length, y.length)
    val out = new Array[Double](n)
    var i = 0
    while (i < n) { out(i) = x(i) - y(i); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** `a · b` as a native codegen'd expression over two `array<double>` columns. */
case class DotProductExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "vec_dot"
  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorAlgo.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.VectorAlgo.dot($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProductExpr =
    copy(left = l, right = r)
}

/** Cosine similarity as a native codegen'd expression (single fused pass). */
case class CosineSimExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "vec_cosine"
  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorAlgo.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.VectorAlgo.cosine($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimExpr =
    copy(left = l, right = r)
}

/** Σ elements as a native codegen'd expression (the `aggregate()` HOF walks
  * interpreted per element — the exact pitfall this expr layer exists for).
  */
case class VecSumExpr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "vec_sum"
  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any): Any =
    VectorAlgo.sum(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.expr.VectorAlgo.sum($a)")

  override protected def withNewChildInternal(newChild: Expression): VecSumExpr =
    copy(child = newChild)
}

/** Elementwise difference as a native codegen'd expression — the per-row
  * residual `x − centroid(cell(x))` of IVF-PQ residual encoding.
  */
case class VecSubExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "vec_sub"
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(DoubleType, containsNull = false)

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorAlgo.sub(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.VectorAlgo.sub($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecSubExpr =
    copy(left = l, right = r)
}

object VectorMath {
  private def asDouble(c: Column): Column = c.cast("array<double>")

  def dot(a: Column, b: Column): Column =
    ColumnShim.column(DotProductExpr(
      ColumnShim.expression(asDouble(a)), ColumnShim.expression(asDouble(b))))

  def cosine(a: Column, b: Column): Column =
    ColumnShim.column(CosineSimExpr(
      ColumnShim.expression(asDouble(a)), ColumnShim.expression(asDouble(b))))

  def sum(a: Column): Column =
    ColumnShim.column(VecSumExpr(ColumnShim.expression(asDouble(a))))

  def sub(a: Column, b: Column): Column =
    ColumnShim.column(VecSubExpr(
      ColumnShim.expression(asDouble(a)), ColumnShim.expression(asDouble(b))))
}
