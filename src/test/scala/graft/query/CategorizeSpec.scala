package graft.query

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** categorize_text semantics: the digit-token key rule, exact-key
  * grouping (similarity_threshold 100), and the order-free CC merge for
  * sub-100 thresholds.
  */
class CategorizeSpec extends SparkSpecBase {
  import spark.implicits._

  test("categoryKey drops digit-bearing tokens and normalizes") {
    val got = Seq(
      "User 42 login from host h9",
      "user 17 login from host web4",
      "ERROR: code=500 at /api/v2",
      "12 34 56",
    ).toDF("m").select(Categorize.categoryKey(col("m"))).as[String].collect().toSeq
    assert(got === Seq(
      "user login from host",
      "user login from host",
      "error code at api", // digit-bearing tokens (500, v2) out, rest analyzed
      "",                  // all-variable message: the empty-key category
    ))
  }

  test("categorizeText groups exact keys, orders by count then key") {
    val msgs = Seq(
      "user 1 login", "user 2 login", "user 3 login",
      "disk 1 full", "disk 9 full",
      "reboot now", "reboot now",
      "4816",
    ).toDF("m")
    val got = Categorize.categorizeText(msgs, col("m"), size = 10)
      .as[(String, Long)].collect().toSeq
    assert(got === Seq(
      ("user login", 3L),
      ("disk full", 2L), ("reboot now", 2L), // count tie -> key asc
      ("", 1L),                              // the all-variable message
    ))
    intercept[IllegalArgumentException](
      Categorize.categorizeText(msgs, col("m"), size = 0))
  }

  test("categorizeMerged: CC closure at the threshold, narrowed key, sums") {
    val msgs = Seq(
      "user 1 login from host", "user 2 login from host", "user 3 login from host",
      "user 4 login from host retry 1", "user 5 login from host retry 2",
      "disk 7 failure alarm",
      "cache miss 12", "cache hit 9 evict",
    ).toDF("m")
    // exact keys: "user login from host" (3), "user login from host retry"
    // (2) -> overlap 4/5 = 0.8 >= 0.7 merges them, key narrows to the
    // shared tokens in the representative's order, counts sum;
    // "cache miss" vs "cache hit evict" overlap 1/3 stays split
    val got = Categorize.categorizeMerged(msgs, col("m"), threshold = 0.7)
      .as[(String, Long)].collect().toSeq
    assert(got === Seq(
      ("user login from host", 5L),
      ("cache hit evict", 1L), ("cache miss", 1L),
      ("disk failure alarm", 1L)))
    // at threshold 1.0 nothing merges and the exact categories survive
    val strict = Categorize.categorizeMerged(msgs, col("m"), threshold = 1.0)
      .as[(String, Long)].collect().toSeq
    assert(strict.toSet === Set(
      ("user login from host", 3L), ("user login from host retry", 2L),
      ("cache miss", 1L), ("cache hit evict", 1L), ("disk failure alarm", 1L)))
    intercept[IllegalArgumentException](
      Categorize.categorizeMerged(msgs, col("m"), threshold = 0.0))
    intercept[IllegalArgumentException](
      Categorize.categorizeMerged(msgs, col("m"), threshold = 1.5))
  }
}
