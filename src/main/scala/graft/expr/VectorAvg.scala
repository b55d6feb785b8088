package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Mutable aggregation state: element-wise sums plus a row count. */
final class VectorAvgBuffer(var sums: Array[Double], var n: Long)

/** Element-wise mean of an `array<double>` column — the centroid aggregate
  * Spark lacks (built-in `avg` is scalar-only; a higher-order-function
  * reformulation would need `collect_list`, materializing every vector per
  * group). `TypedImperativeAggregate` gives the classic two-phase shape:
  * per-partition partial sums, one merge per group per partition — shuffle
  * volume is `groups × dim` doubles regardless of row count, which is what
  * makes k-means refinement feasible over billions of embeddings.
  *
  * Rows whose array is null are ignored; an all-null group yields null.
  * Vectors shorter than the longest seen are zero-padded (ragged inputs
  * are a data bug, but the aggregate must not crash mid-job at scale).
  */
case class VectorAvg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VectorAvgBuffer] with UnaryLike[Expression] {

  override def prettyName: String = "vec_avg"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def createAggregationBuffer(): VectorAvgBuffer = new VectorAvgBuffer(null, 0L)

  private def accumulate(buf: VectorAvgBuffer, arr: ArrayData): Unit = {
    val m = arr.numElements()
    if (buf.sums == null) buf.sums = new Array[Double](m)
    else if (buf.sums.length < m) buf.sums = java.util.Arrays.copyOf(buf.sums, m)
    var i = 0
    while (i < m) { buf.sums(i) += arr.getDouble(i); i += 1 }
    buf.n += 1
  }

  override def update(buf: VectorAvgBuffer, input: InternalRow): VectorAvgBuffer = {
    val v = child.eval(input)
    if (v != null) accumulate(buf, v.asInstanceOf[ArrayData])
    buf
  }

  override def merge(buf: VectorAvgBuffer, other: VectorAvgBuffer): VectorAvgBuffer = {
    if (other.sums != null) {
      if (buf.sums == null) { buf.sums = other.sums.clone(); buf.n = other.n }
      else {
        if (buf.sums.length < other.sums.length)
          buf.sums = java.util.Arrays.copyOf(buf.sums, other.sums.length)
        var i = 0
        while (i < other.sums.length) { buf.sums(i) += other.sums(i); i += 1 }
        buf.n += other.n
      }
    }
    buf
  }

  override def eval(buf: VectorAvgBuffer): Any =
    if (buf.n == 0L || buf.sums == null) null
    else new GenericArrayData(buf.sums.map(_ / buf.n))

  override def serialize(buf: VectorAvgBuffer): Array[Byte] = {
    val dim = if (buf.sums == null) 0 else buf.sums.length
    val bb = java.nio.ByteBuffer.allocate(8 + 4 + 8 * dim)
    bb.putLong(buf.n)
    bb.putInt(dim)
    var i = 0
    while (i < dim) { bb.putDouble(buf.sums(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VectorAvgBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getLong()
    val dim = bb.getInt()
    if (dim == 0) new VectorAvgBuffer(null, n)
    else {
      val sums = new Array[Double](dim)
      var i = 0
      while (i < dim) { sums(i) = bb.getDouble(); i += 1 }
      new VectorAvgBuffer(sums, n)
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorAvg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorAvg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VectorAvg =
    copy(child = newChild)
}

object VectorAvg {
  /** `Column` surface: element-wise mean of an array<double> column. */
  def vecAvg(v: Column): Column =
    ColumnShim.column(
      VectorAvg(ColumnShim.expression(v.cast("array<double>"))).toAggregateExpression())
}
