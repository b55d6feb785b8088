package graft.query

import graft.SparkSpecBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Percolator (reverse search / alerting) and the snapshot diff — batch
  * semantics, parser round trip, and the streaming alert tier over
  * MemoryStream.
  */
class PercolatorSpec extends SparkSpecBase {
  import spark.implicits._

  private val stored = Percolator.fromStrings(Seq(
    "a_dup" -> "text:dup",
    "a_phrase" -> """text:"vector scan"""",
    "a_range" -> "n:[10 TO *]"), defaultField = "text")

  private def docs = Seq(
    (1L, "dup vector scan here", 5L),
    (2L, "vector of rows", 20L),
    (3L, "nothing relevant", 1L),
  ).toDF("id", "text", "n")

  test("percolate: every doc keeps a row; matches in registration order; long form explodes") {
    val wide = Percolator.percolate(docs, stored)
      .select("id", "matched_queries").as[(Long, Seq[String])].collect().toMap
    assert(wide(1L) === Seq("a_dup", "a_phrase"))
    assert(wide(2L) === Seq("a_range"))
    assert(wide(3L) === Seq.empty)
    val long = Percolator.percolateLong(docs, "id", stored)
      .as[(String, Long)].collect().toSet
    assert(long === Set(("a_dup", 1L), ("a_phrase", 1L), ("a_range", 2L)))
    intercept[IllegalArgumentException](
      Percolator.percolate(docs, stored :+ stored.head))
  }

  test("percolateSharded: shard boundaries are invisible; compiled from the at-rest table") {
    // 2-per-plan over 3 queries forces a 2-shard split mid-set
    val sharded = Percolator.percolateSharded(docs, "id", stored, maxQueriesPerPlan = 2)
      .as[(String, Long)].collect().toSet
    val oneShot = Percolator.percolateLong(docs, "id", stored)
      .as[(String, Long)].collect().toSet
    assert(sharded === oneShot)
    // degenerate shards (1 query per plan) still agree
    assert(Percolator.percolateSharded(docs, "id", stored, maxQueriesPerPlan = 1)
      .as[(String, Long)].collect().toSet === oneShot)
    intercept[IllegalArgumentException](
      Percolator.percolateSharded(docs, "id", stored, maxQueriesPerPlan = 0))
    intercept[IllegalArgumentException](
      Percolator.percolateSharded(docs, "id", stored :+ stored.head, 2))
    // the deployment path: stored queries compiled FROM ROWS, same alerts
    val atRest = Seq(
      ("a_dup", "text:dup"), ("a_phrase", """text:"vector scan""""),
      ("a_range", "n:[10 TO *]")).toDF("qid", "q")
    val fromTable = Percolator.storedFromTable(atRest, "qid", "q", defaultField = "text")
    assert(Percolator.percolateLong(docs, "id", fromTable)
      .as[(String, Long)].collect().toSet === oneShot)
    // the driver-side collect is BOUNDED: an oversized registry table
    // fails loudly (pointing at sharding) instead of OOMing the driver
    val oversized = intercept[IllegalArgumentException](
      Percolator.storedFromTable(atRest, "qid", "q", defaultField = "text",
        maxQueries = 2))
    assert(oversized.getMessage.contains("exceeds maxQueries=2"))
    assert(oversized.getMessage.contains("percolateSharded"))
    // at the bound exactly, the registry compiles
    assert(Percolator.storedFromTable(atRest, "qid", "q",
      defaultField = "text", maxQueries = 3).size === 3)
  }

  test("streaming percolate: each arriving micro-batch emits its alerts") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String, Long)]
    val alerts = Percolator.percolateLong(
      mem.toDS().toDF("id", "text", "n"), "id", stored)
    val q = alerts.writeStream.format("memory").queryName("percolate_spec")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData((1L, "dup vector scan here", 5L))
      q.processAllAvailable()
      assert(spark.table("percolate_spec").as[(String, Long)].collect().toSet ===
        Set(("a_dup", 1L), ("a_phrase", 1L)))
      mem.addData((2L, "no alert here", 1L), (3L, "dup again", 99L))
      q.processAllAvailable()
      assert(spark.table("percolate_spec").as[(String, Long)].collect().toSet ===
        Set(("a_dup", 1L), ("a_phrase", 1L), ("a_dup", 3L), ("a_range", 3L)))
    } finally q.stop()
  }

  test("snapshotDiff classifies added, removed, changed; drops unchanged") {
    val before = Seq((1L, "same"), (2L, "old text"), (3L, "gone")).toDF("id", "text")
    val after = Seq((1L, "same"), (2L, "new text"), (4L, "fresh")).toDF("id", "text")
    val out = graft.ops.Drift.snapshotDiff(before, after, "id", col("text"))
      .as[(Long, String)].collect().sorted.toSeq
    assert(out === Seq((2L, "changed"), (3L, "removed"), (4L, "added")))
  }
}
