package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Point-in-time-correct example assembly: strict window boundaries (the
  * leakage edges), per-entity isolation, empty-frame defaults.
  */
class FeaturesSpec extends SparkSpecBase {
  import spark.implicits._

  private val Day = 24L * 3600 * 1000

  /** Events in epoch-ms-friendly timestamps: user 1 clicks at day 10 with
    * purchases scattered around every boundary; user 2 is noise isolation.
    */
  private def events = Seq(
    // user 1 anchor
    (100L, 1L, "click", 0.0, ms(10 * Day)),
    // past outcomes: exactly at -7d (IN: frame is [-7d, -1ms]), inside,
    // at the same ms (OUT), just before the window (OUT)
    (1L, 1L, "purchase", 10.0, ms(3 * Day)),
    (2L, 1L, "purchase", 20.5, ms(9 * Day)),
    (3L, 1L, "purchase", 99.0, ms(10 * Day)),
    (4L, 1L, "purchase", 99.0, ms(3 * Day - 1)),
    // future outcomes: just after (IN), exactly at +3d (IN), beyond (OUT)
    (5L, 1L, "purchase", 1.0, ms(10 * Day + 1)),
    (6L, 1L, "purchase", 1.0, ms(13 * Day)),
    (7L, 1L, "purchase", 1.0, ms(13 * Day + 1)),
    // other users' events must not bleed in
    (8L, 2L, "purchase", 500.0, ms(9 * Day)),
    // user 2 anchor with an empty past and no conversion
    (200L, 2L, "click", 0.0, ms(30 * Day)),
    // non-outcome event types never count
    (9L, 1L, "view", 1000.0, ms(9 * Day)),
  ).toDF("event_id", "user_id", "event_type", "value", "ts")

  private def ms(m: Long) = new java.sql.Timestamp(m)

  test("rollingExamples: strict past/future boundaries, entity isolation, defaults") {
    val out = Features.rollingExamples(events, "user_id", "ts",
        anchorCond = col("event_type") === "click",
        outcomeCond = col("event_type") === "purchase",
        valueCol = floor(col("value") * 100),
        featureWindowMs = 7 * Day, labelWindowMs = 3 * Day,
        carry = Seq("event_id"))
      .orderBy("event_id")
      .as[(Long, Long, Long, Long, Boolean)].collect().toSeq
    // user 1: past = {1 (at -7d, inclusive), 2}; 3 (same ms) and 4 (past
    // the window) excluded; cents 1000 + 2050; converted by 5 and 6
    // user 2: empty frames default to 0 / false (8 is 21 days earlier)
    assert(out === Seq(
      (100L, 1L, 2L, 3050L, true),
      (200L, 2L, 0L, 0L, false)))
  }

  test("rollingExamples label flips off when the only outcome is past the horizon") {
    val df = Seq(
      (1L, 1L, "click", 0.0, ms(10 * Day)),
      (2L, 1L, "purchase", 1.0, ms(13 * Day + 1)),
    ).toDF("event_id", "user_id", "event_type", "value", "ts")
    val out = Features.rollingExamples(df, "user_id", "ts",
        col("event_type") === "click", col("event_type") === "purchase",
        floor(col("value") * 100), 7 * Day, 3 * Day, Seq("event_id"))
      .as[(Long, Long, Long, Long, Boolean)].collect().toSeq
    assert(out === Seq((1L, 1L, 0L, 0L, false)))
  }

  test("time-chunked mega-entity form is row-for-row identical to the unchunked window") {
    // One mega-entity with anchors and outcomes straddling every chunk
    // boundary (chunk = 8 days; windows 7d back / 3d forward), plus a
    // small entity for isolation. Events land exactly ON boundaries, one
    // ms either side, and deep inside chunks.
    val Chunk = 8 * Day
    val mega = (0 until 120).map { i =>
      val t = i.toLong * 2 * Day + (i % 3) // straddles every 8d boundary
      val typ = if (i % 4 == 0) "click" else "purchase"
      (1000L + i, 7L, typ, (i % 10).toDouble, ms(t))
    }
    val edgy = Seq(
      (1L, 7L, "purchase", 5.0, ms(Chunk)),          // exactly on a boundary
      (2L, 7L, "purchase", 5.0, ms(Chunk - 1)),      // one ms before
      (3L, 7L, "click", 0.0, ms(Chunk + 1)),         // anchor just after
      (4L, 7L, "click", 0.0, ms(2 * Chunk)),         // anchor on a boundary
      (5L, 9L, "purchase", 5.0, ms(Chunk)),          // other entity
      (6L, 9L, "click", 0.0, ms(Chunk + 1)),
    )
    val df = (mega ++ edgy).toDF("event_id", "user_id", "event_type", "value", "ts")
    def run(chunkMs: Long) = Features.rollingExamples(df, "user_id", "ts",
        col("event_type") === "click", col("event_type") === "purchase",
        floor(col("value") * 100), 7 * Day, 3 * Day, Seq("event_id"),
        chunkMs = chunkMs)
      .orderBy("event_id")
      .as[(Long, Long, Long, Long, Boolean)].collect().toSeq
    val plain = run(0)
    assert(plain.nonEmpty)
    assert(run(Chunk) === plain)
    // a chunk as small as the windows allow still agrees
    assert(run(7 * Day) === plain)
  }
}
