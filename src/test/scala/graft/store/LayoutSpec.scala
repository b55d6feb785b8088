package graft.store

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Z-order layout: bucketize exactness, Morton bit layout, and the property
  * the whole module exists for — Z-ordered files carry a narrow min/max
  * envelope in EVERY interleaved dimension (single-column sort only prunes
  * its own column).
  */
class LayoutSpec extends SparkSpecBase {
  import spark.implicits._

  test("bucketize maps range edges and midpoints exactly, clamping outliers") {
    val got = Seq(-5L, 0L, 74L, 149L, 400L).toDF("x")
      .select(Layout.bucketize(col("x"), 0, 149, 8).as("b"))
      .as[Long].collect().toSeq
    // (x * 256) / 150 with truncating integer division; outliers clamp.
    assert(got === Seq(0L, 0L, 74L * 256 / 150, 254L, 254L))
  }

  test("zValue interleaves dimension bits at stride-d positions") {
    // x=0b101 at even positions, y=0b011 at odd: 10001 | 01010 = 11011 = 27.
    val z = Seq((5L, 3L)).toDF("x", "y")
      .select(Layout.zValue(Seq(col("x"), col("y")), 3).as("z"))
      .as[Long].head()
    assert(z === 27L)
  }

  test("zValue matches a driver-side Morton reference on a value sweep") {
    def morton(x: Long, y: Long, bits: Int): Long =
      (0 until bits).map(b => (((x >> b) & 1) << (2 * b)) | (((y >> b) & 1) << (2 * b + 1)))
        .reduce(_ | _)
    val rows = (0 until 1000).map(i => (i.toLong % 256, (i.toLong * 37) % 256))
    val got = rows.toDF("x", "y")
      .select(Layout.zValue(Seq(col("x"), col("y")), 8).as("z"))
      .as[Long].collect().toSeq
    assert(got === rows.map { case (x, y) => morton(x, y, 8) })
  }

  test("sql mirrors render the same shift-mask arithmetic they claim") {
    assert(Layout.zValueSql(Seq("a", "b"), 2) ===
      "((((a >> 0) & 1) << 0) | (((a >> 1) & 1) << 2) | (((b >> 0) & 1) << 1) | (((b >> 1) & 1) << 3))")
    assert(Layout.bucketizeSql("x", 0, 149, 8) ===
      "(((greatest(0, least(149, x)) - 0) * 256) // 150)")
  }

  test("Z-ordered files are narrow in BOTH dimensions; x-sorted files are not") {
    // Two independent-ish uniform dims on [0, 256): 4096 rows -> 16 files,
    // so a perfect Z layout gives each file one 64x64 tile of the grid.
    val df = (0 until 4096)
      .map(i => (i.toLong, i.toLong % 256, (i.toLong * 37 + 11) % 256))
      .toDF("id", "x", "y")
    def fileSpans(path: String): (Double, Double) = {
      val spans = spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
        .agg(avg("sx"), avg("sy"))
        .as[(Double, Double)].head()
      spans
    }
    val zDir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    Layout.writeZOrdered(df,
      Layout.zValue(Seq(col("x"), col("y")), 8), s"$zDir/z", numFiles = 16)
    df.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(s"$zDir/xsort")

    val (zx, zy) = fileSpans(s"$zDir/z")
    val (sx, sy) = fileSpans(s"$zDir/xsort")
    // Z: every file's envelope stays a fraction of the 255 global span in
    // both dims (range boundaries are sampled, so allow slack over the
    // ideal 63). Single-dim sort: x is tight but y is the full range —
    // filters on y prune nothing.
    assert(zx < 140 && zy < 140, s"z-order spans too wide: x=$zx y=$zy")
    assert(sx < 60, s"x-sort should be tight on x, got $sx")
    assert(sy > 220, s"x-sort leaves y unclustered (expected ~255), got $sy")
  }

  test("selective 2-D filter on a Z-ordered table actually skips row groups at read") {
    // End-to-end proof of the payoff the module exists for: the SAME
    // selective filter, against the SAME rows in two layouts, measured at
    // the scan (vanilla Spark prunes parquet ROW GROUPS from footer
    // min/max; with one row group per file here, skipped row groups ==
    // skipped file payloads — file-level listing pruning needs a manifest
    // layer like Delta's, which is out of scope by design).
    val df = (0 until 4096)
      .map(i => (i.toLong, i.toLong % 256, (i.toLong * 37 + 11) % 256))
      .toDF("id", "x", "y")
    val dir = java.nio.file.Files.createTempDirectory("graft_zprune").toString
    Layout.writeZOrdered(df,
      Layout.zValue(Seq(col("x"), col("y")), 8), s"$dir/z", numFiles = 16)
    // Control: clustered by id — x/y unclustered within every file, the
    // layout an append-ordered events table naturally has.
    df.repartitionByRange(16, col("id")).sortWithinPartitions("id")
      .write.mode("overwrite").parquet(s"$dir/byid")

    // A 32x32 tile = 1/64 of the value grid; both bounds are range
    // predicates that push down to the parquet reader.
    val pred = col("x").between(96, 127) && col("y").between(96, 127)
    def scanned(path: String): (Long, Set[Long]) = {
      val q = spark.read.parquet(path).where(pred)
      // collect() on q itself: metrics live on THIS QueryExecution (a
      // derived .select would execute a different physical plan).
      val ids = q.collect().map(_.getAs[Long]("id")).toSet
      val scans = q.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }
      assert(scans.nonEmpty, "no parquet scan in plan")
      assert(scans.forall(_.metadata("PushedFilters").contains("GreaterThanOrEqual(x,96")),
        s"range filter not pushed: ${scans.map(_.metadata("PushedFilters"))}")
      (scans.map(_.metrics("numOutputRows").value).sum, ids)
    }
    val (zRows, zIds) = scanned(s"$dir/z")
    val (idRows, idIds) = scanned(s"$dir/byid")
    assert(zIds === idIds, "layouts must return identical rows")
    assert(zIds.nonEmpty, "filter selected nothing — tile misses the data")
    // id-clustered: every file spans the full x range, nothing skips.
    assert(idRows === 4096L, s"control layout unexpectedly pruned ($idRows)")
    // Z-ordered: the tile intersects a handful of the 16 file envelopes;
    // at least 3/4 of the row groups must be skipped outright.
    assert(zRows <= 1024L,
      s"z-ordered scan read $zRows of 4096 rows — row-group pruning not firing")
  }
}
