package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Standard base-32 geohash encoding (public algorithm, geohash.org): bits of
  * longitude and latitude are interleaved (longitude first) and emitted 5 bits
  * per character. Cell assignment matches Elasticsearch's `geohash_grid`
  * aggregation, which the reference's IncidentMap tile map uses at precision 2
  * (`notebooks/kibana-content/kibana-exported-visualizations.json:7`).
  */
object GeohashAlgo {
  private val Base32 = "0123456789bcdefghjkmnpqrstuvwxyz".toCharArray
  val MaxPrecision = 12

  def encode(lat: Double, lon: Double, precision: Int): String = {
    val p = math.max(1, math.min(MaxPrecision, precision))
    val sb = new java.lang.StringBuilder(p)
    var latLo = -90.0; var latHi = 90.0
    var lonLo = -180.0; var lonHi = 180.0
    var evenBit = true
    var bits = 0
    var ch = 0
    while (sb.length < p) {
      if (evenBit) {
        val mid = (lonLo + lonHi) / 2
        if (lon >= mid) { ch = (ch << 1) | 1; lonLo = mid }
        else { ch = ch << 1; lonHi = mid }
      } else {
        val mid = (latLo + latHi) / 2
        if (lat >= mid) { ch = (ch << 1) | 1; latLo = mid }
        else { ch = ch << 1; latHi = mid }
      }
      evenBit = !evenBit
      bits += 1
      if (bits == 5) { sb.append(Base32(ch)); bits = 0; ch = 0 }
    }
    sb.toString
  }

  /** Codegen entry point — returns Spark's internal string type directly. */
  def encodeUTF8(lat: Double, lon: Double, precision: Int): UTF8String =
    UTF8String.fromString(encode(lat, lon, precision))

  /** Decode a geohash to its cell's bounding box (latLo, latHi, lonLo, lonHi). */
  def decodeBounds(hash: String): (Double, Double, Double, Double) = {
    var latLo = -90.0; var latHi = 90.0
    var lonLo = -180.0; var lonHi = 180.0
    var evenBit = true
    hash.toLowerCase.foreach { c =>
      val cd = java.util.Arrays.binarySearch(Base32, c) match {
        case i if i >= 0 => i
        case _ => throw new IllegalArgumentException(s"invalid geohash char: $c")
      }
      var mask = 16
      while (mask > 0) {
        if (evenBit) {
          val mid = (lonLo + lonHi) / 2
          if ((cd & mask) != 0) lonLo = mid else lonHi = mid
        } else {
          val mid = (latLo + latHi) / 2
          if ((cd & mask) != 0) latLo = mid else latHi = mid
        }
        evenBit = !evenBit
        mask >>= 1
      }
    }
    (latLo, latHi, lonLo, lonHi)
  }

  /** Cell center point (lat, lon). */
  def decodeCenter(hash: String): (Double, Double) = {
    val (latLo, latHi, lonLo, lonHi) = decodeBounds(hash)
    ((latLo + latHi) / 2, (lonLo + lonHi) / 2)
  }
}

/** Native Catalyst expression for geohash encoding — participates in
  * whole-stage codegen via a static call, so `groupBy(geohash(...))` keys are
  * computed inline in the generated aggregate loop (no UDF serialization or
  * boxing in the hot path).
  */
case class GeohashExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  // Inputs are cast to (double, double, int) by the Column builder below.
  override def prettyName: String = "geohash"
  override def dataType: DataType = StringType

  override protected def nullSafeEval(lat: Any, lon: Any, precision: Any): Any =
    GeohashAlgo.encodeUTF8(
      lat.asInstanceOf[Double], lon.asInstanceOf[Double], precision.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (lat, lon, p) =>
      s"graft.expr.GeohashAlgo.encodeUTF8($lat, $lon, $p)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): GeohashExpr =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object Geohash {
  /** `Column` surface: `geohash(lat, lon, precision)`. */
  def geohash(lat: Column, lon: Column, precision: Int): Column =
    ColumnShim.column(GeohashExpr(
      ColumnShim.expression(lat.cast(DoubleType)),
      ColumnShim.expression(lon.cast(DoubleType)),
      ColumnShim.expression(org.apache.spark.sql.functions.lit(precision))))
}
