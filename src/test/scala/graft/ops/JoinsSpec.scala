package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Salted equi-join: result parity with the plain join, salt spread, and
  * determinism — the manual skew tool for the hot-key-floods-one-task case
  * AQE's partition splitting can't fix.
  */
class JoinsSpec extends SparkSpecBase {
  import spark.implicits._

  // One hot key (k=1, 100 rows) + a long tail; dimension side 1 row per key.
  private def fact = (1 to 100).map(i => (1L, i.toLong)) ++
    (2L to 20L).map(k => (k, k * 1000))
  private def factDf = fact.toDF("k", "row_id")
  private def dimDf = (1L to 20L).map(k => (k, s"name_$k")).toDF("k", "name")

  test("saltedEquiJoin returns exactly the plain join's rows") {
    val plain = factDf.join(dimDf, Seq("k"))
      .select("k", "row_id", "name").as[(Long, Long, String)].collect().sorted.toSeq
    val salted = Joins.saltedEquiJoin(factDf, dimDf, Seq("k"), "row_id", numSalts = 8)
      .select("k", "row_id", "name").as[(Long, Long, String)].collect().sorted.toSeq
    assert(salted === plain)
  }

  test("saltedEquiJoin matches plain join with a many-rows-per-key right side") {
    val dimMulti = (1L to 5L).flatMap(k => Seq((k, "a"), (k, "b"))).toDF("k", "tag")
    val plain = factDf.join(dimMulti, Seq("k"))
      .select("k", "row_id", "tag").as[(Long, Long, String)].collect().sorted.toSeq
    val salted = Joins.saltedEquiJoin(factDf, dimMulti, Seq("k"), "row_id", numSalts = 4)
      .select("k", "row_id", "tag").as[(Long, Long, String)].collect().sorted.toSeq
    assert(salted === plain)
  }

  test("the hot key's rows spread across many salt values") {
    val salts = factDf.where(col("k") === 1L)
      .withColumn("_salt", pmod(xxhash64(col("row_id")), lit(8L)))
      .select("_salt").distinct().count()
    assert(salts >= 6, s"hot key landed on only $salts of 8 salts")
  }

  // --- asOfJoin: point-in-time enrichment ---

  private def trades = Seq(
    (1L, ts("2024-01-01 10:00:00"), "t1"),
    (1L, ts("2024-01-01 10:05:00"), "t2"),
    (1L, ts("2024-01-01 12:00:00"), "t3"),
    (2L, ts("2024-01-01 09:00:00"), "t4")
  ).toDF("k", "ts", "trade")

  private def quotes = Seq(
    (1L, ts("2024-01-01 09:59:00"), 10.0, 1L),
    (1L, ts("2024-01-01 10:05:00"), 11.0, 2L), // equal-instant match for t2
    (1L, ts("2024-01-01 10:30:00"), 12.0, 3L),
    (2L, ts("2024-01-01 09:30:00"), 99.0, 4L)  // AFTER t4 — must not match
  ).toDF("k", "ts", "px", "qid")

  test("asOfJoin attaches the latest right row at or before each left time") {
    val got = Joins.asOfJoin(trades, quotes, Seq("k"), "ts", "ts", Seq("px"),
        rightTieBreak = Some("qid"))
      .select("trade", "asof_px").as[(String, Option[Double])]
      .collect().toMap
    assert(got === Map(
      "t1" -> Some(10.0), // 09:59 quote
      "t2" -> Some(11.0), // inclusive: quote AT 10:05 wins over 09:59
      "t3" -> Some(12.0), // latest prior (10:30)
      "t4" -> None))      // only quote for k=2 is in the future
  }

  test("asOfJoin tolerance nulls out matches older than the lookback window") {
    val got = Joins.asOfJoin(trades, quotes, Seq("k"), "ts", "ts", Seq("px"),
        tolerance = Some(expr("INTERVAL 10 MINUTES")), rightTieBreak = Some("qid"))
      .select("trade", "asof_px").as[(String, Option[Double])]
      .collect().toMap
    // t3 at 12:00: latest quote 10:30 is 90 min old — out of window.
    assert(got("t3") === None)
    assert(got("t1") === Some(10.0) && got("t2") === Some(11.0))
  }

  test("asOfJoin breaks (key, time) ties by the largest rightTieBreak") {
    val dup = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1.0, 7L),
      (1L, ts("2024-01-01 10:00:00"), 2.0, 9L),
      (1L, ts("2024-01-01 10:00:00"), 3.0, 8L)
    ).toDF("k", "ts", "px", "qid")
    val one = Seq((1L, ts("2024-01-01 11:00:00"), "t")).toDF("k", "ts", "trade")
    val got = Joins.asOfJoin(one, dup, Seq("k"), "ts", "ts", Seq("px"),
        rightTieBreak = Some("qid"))
      .select("asof_px").as[Double].head()
    assert(got === 2.0, "qid=9 is the deterministic winner")
  }

  test("asOfJoin carries the matched right timestamp and fills struct atomically") {
    val got = Joins.asOfJoin(trades, quotes, Seq("k"), "ts", "ts", Seq("px", "qid"),
        rightTieBreak = Some("qid"))
      .where(col("trade") === "t3")
      .select("asof_ts", "asof_px", "asof_qid")
      .as[(java.sql.Timestamp, Double, Long)].head()
    assert(got === ((ts("2024-01-01 10:30:00"), 12.0, 3L)))
  }

  test("keyskewProfile surfaces the hot key first with its share") {
    val top = Joins.keyskewProfile(factDf, Seq("k"), n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(top.head === (1L, 100L))
    val share = Joins.keyskewProfile(factDf, Seq("k"), n = 1)
      .select("share").as[Double].head()
    assert(math.abs(share - 100.0 / fact.size) < 1e-12)
  }

  test("keyskewProfile plan: no unpartitioned window, one reused exchange") {
    // The profiler targets high-cardinality keys, so an unpartitioned
    // Window (ALL distinct-key rows -> one task) would make the diagnostic
    // itself the bottleneck. Pin its absence, and pin that the top-n branch
    // and the scalar-total branch share ONE groupBy exchange (ReuseExchange)
    // instead of scanning the input twice. AQE hides both in explain output
    // (memory: AQE explain quirks), so assert on the non-adaptive plan.
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = Joins.keyskewProfile(factDf, Seq("k"), n = 3)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Window"), s"unpartitioned window crept back:\n$plan")
      assert(plan.contains("ReusedExchange"),
        s"total branch re-aggregates the input instead of reusing the exchange:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("asOfJoinForward attaches the earliest right row at or after each left time") {
    val got = Joins.asOfJoinForward(trades, quotes, Seq("k"), "ts", "ts", Seq("px"),
        rightTieBreak = Some("qid"))
      .select("trade", "asof_px").as[(String, Option[Double])]
      .collect().toMap
    assert(got === Map(
      "t1" -> Some(11.0), // next at-or-after 10:00 is the 10:05 quote
      "t2" -> Some(11.0), // inclusive: the quote AT 10:05 matches
      "t3" -> None,       // no quote after 12:00
      "t4" -> Some(99.0)))// the future quote forward CAN see
  }

  test("asOfJoinForward tolerance bounds the lookahead") {
    val got = Joins.asOfJoinForward(trades, quotes, Seq("k"), "ts", "ts", Seq("px"),
        tolerance = Some(expr("INTERVAL 10 MINUTES")), rightTieBreak = Some("qid"))
      .select("trade", "asof_px").as[(String, Option[Double])]
      .collect().toMap
    // t4's next quote is 30 min ahead — outside the 10-min window
    assert(got("t4") === None && got("t1") === Some(11.0))
  }

  test("asOfJoinForward breaks (key, time) ties by the largest rightTieBreak") {
    val one = Seq((1L, ts("2024-01-01 10:00:00"), "t")).toDF("k", "ts", "trade")
    val dup = Seq(
      (1L, ts("2024-01-01 10:30:00"), 1.0, 1L),
      (1L, ts("2024-01-01 10:30:00"), 2.0, 9L),
      (1L, ts("2024-01-01 11:00:00"), 3.0, 5L) // later — must lose to 10:30
    ).toDF("k", "ts", "px", "qid")
    val got = Joins.asOfJoinForward(one, dup, Seq("k"), "ts", "ts", Seq("px"),
        rightTieBreak = Some("qid"))
      .select("asof_px").as[Double].head()
    assert(got === 2.0)
  }

  // ---- range join ----

  private val leftIv = Seq(
    // (id, key, start, end)
    (1L, "a", 0L, 10L),
    (2L, "a", 95L, 205L),  // spans three 100-bins — pairs must emit once
    (3L, "b", 0L, 10L),    // same interval as 1 under a different key
    (4L, "a", 300L, 310L)
  ).toDF("lid", "k", "ls", "le")

  private val rightIv = Seq(
    (10L, "a", 5L, 8L),     // inside 1
    (11L, "a", 90L, 120L),  // overlaps 2 across its first two bins
    (12L, "a", 190L, 290L), // overlaps 2 in its last bin
    (13L, "a", 20L, 30L),   // same bin as 1, disjoint — must NOT pair
    (14L, "b", 9L, 50L),    // overlaps 3 only (key isolation)
    (15L, "a", 311L, 320L)  // adjacent to 4, closed-interval disjoint
  ).toDF("rid", "k", "rs", "re")

  test("rangeJoin equals the brute-force overlap join, each pair once") {
    val got = Joins.rangeJoin(leftIv, rightIv, Seq("k"), "ls", "le", "rs", "re", binWidth = 100L)
      .select("lid", "rid").as[(Long, Long)].collect().toSeq.sorted
    val brute = leftIv.join(rightIv, Seq("k"))
      .where(col("ls") <= col("re") && col("rs") <= col("le"))
      .select("lid", "rid").as[(Long, Long)].collect().toSeq.sorted
    assert(got == brute)
    assert(got == Seq((1L, 10L), (2L, 11L), (2L, 12L), (3L, 14L)))
    // multi-bin overlaps did not duplicate
    assert(got.size == got.distinct.size)
  }

  test("rangeJoin at a tiny binWidth still emits each pair exactly once") {
    val got = Joins.rangeJoin(leftIv, rightIv, Seq("k"), "ls", "le", "rs", "re", binWidth = 3L)
      .select("lid", "rid").as[(Long, Long)].collect().toSeq.sorted
    assert(got == Seq((1L, 10L), (2L, 11L), (2L, 12L), (3L, 14L)))
  }

  test("rangeJoin plans a hash join on (keys, bin), not a nested loop") {
    val plan = Joins.rangeJoin(leftIv, rightIv, Seq("k"), "ls", "le", "rs", "re", 100L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"quadratic join shape:\n$plan")
  }
}
