package graft.store

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional file layout via Z-ordering (Morton order — public
  * bit-interleaving technique; the clustering trick behind Delta/Iceberg
  * `OPTIMIZE ZORDER BY`).
  *
  * Why it exists at 100 TB: parquet scan pruning works off per-file (and
  * per-row-group) min/max column statistics. A table sorted by ONE column
  * prunes filters on that column and nothing else; a table Z-ordered on
  * `d` columns gives every file a narrow min/max envelope in ALL `d`
  * dimensions at once (a contiguous Z range is a small aligned tile of the
  * grid), so selective filters on ANY of the interleaved columns skip most
  * files. The reference's serving half leans on Elasticsearch for exactly
  * this multi-attribute selectivity; at rest on parquet, layout is the only
  * equivalent lever — no index structure to maintain, just write order.
  *
  * Everything here is plain `Column` algebra over 64-bit integers (shifts,
  * masks, ors) — whole-stage-codegen'd, zero UDFs, and restated verbatim in
  * the `layout_zorder` DuckDB oracle ([[zValueSql]]).
  */
object Layout {

  /** Map a numeric column into `2^bits` equal-width integer buckets over the
    * CLOSED range `[lo, hi]`, clamping out-of-range values into the edge
    * buckets. Pure 64-bit integer arithmetic — `(x - lo) * 2^bits /
    * (hi - lo + 1)` with truncating division — so any engine computes the
    * identical bucket (no float rounding at bucket boundaries).
    */
  def bucketize(c: Column, lo: Long, hi: Long, bits: Int): Column = {
    require(hi > lo, "bucketize: hi must exceed lo")
    require(bits >= 1 && bits <= 20, "bucketize: bits out of range")
    val n = 1L << bits
    val q = hi - lo + 1
    require(n < Long.MaxValue / q, "bucketize: range x buckets overflows")
    val clamped = greatest(lit(lo), least(lit(hi), c.cast("long")))
    // Truncating long division without an expr()-string seam: v - v%q is an
    // exact multiple of q, and dividing one representable exact multiple by
    // its representable divisor is error-free in IEEE doubles (both the
    // operands and the true quotient are exact at these magnitudes:
    // v <= range * 2^bits << 2^53). DuckDB's `//` computes the same value.
    val v = (clamped - lit(lo)) * lit(n)
    ((v - (v % lit(q))) / lit(q)).cast("long")
  }

  /** The Z (Morton) value of `d` bucket columns, each holding a non-negative
    * int below `2^bits`: bit `b` of dimension `i` lands at interleaved
    * position `b * d + i`. Columns must already be bucketized — this is
    * deliberate composition, not magic: range-bucket a timestamp, hash- or
    * range-bucket an id, then interleave.
    */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty, "zValue: at least one column")
    val d = cols.size
    require(bits * d <= 62, s"zValue: $bits bits x $d dims exceeds a long")
    val terms = for {
      (c, i) <- cols.zipWithIndex
      b <- 0 until bits
    } yield shiftleft(shiftright(c.cast("long"), b).bitwiseAND(lit(1L)), b * d + i)
    terms.reduce(_.bitwiseOR(_))
  }

  /** DuckDB restatement of [[bucketize]] for oracle SQL (same clamp + exact
    * integer arithmetic; `//` is DuckDB's truncating integer division).
    */
  def bucketizeSql(e: String, lo: Long, hi: Long, bits: Int): String = {
    val n = 1L << bits
    s"(((greatest($lo, least($hi, $e)) - $lo) * $n) // ${hi - lo + 1})"
  }

  /** DuckDB restatement of [[zValue]]: identical bit layout, one shift-mask
    * term per (dimension, bit), OR-folded.
    */
  def zValueSql(exprs: Seq[String], bits: Int): String = {
    val d = exprs.size
    val terms = for {
      (e, i) <- exprs.zipWithIndex
      b <- 0 until bits
    } yield s"((($e >> $b) & 1) << ${b * d + i})"
    terms.mkString("(", " | ", ")")
  }

  /** Write `df` as `numFiles` parquet files clustered by ascending Z value:
    * `repartitionByRange` splits the Z axis into contiguous spans (range
    * exchange — one shuffle, sampled boundaries), and the within-partition
    * sort tightens row-group-level min/max too. Each output file then covers
    * a small aligned tile of the multi-dimensional grid, so min/max pruning
    * fires for filters on any interleaved dimension.
    *
    * `zCol` should be [[zValue]] over bucketized dimensions; it is written
    * into the files as `_z` (a few bytes per row) — dropping it would cost
    * a recompute on every later re-layout, and compaction jobs re-range by
    * it directly.
    */
  def writeZOrdered(df: DataFrame, zCol: Column, path: String, numFiles: Int): Unit = {
    require(numFiles >= 1, "writeZOrdered: numFiles must be >= 1")
    df.withColumn("_z", zCol)
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .write.mode("overwrite").parquet(path)
  }
}
