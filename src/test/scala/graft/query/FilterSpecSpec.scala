package graft.query

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Q1-Q9: predicate compilation and display-text rendering
  * (`collections.js:146-257`).
  */
class FilterSpecSpec extends SparkSpecBase {
  import spark.implicits._

  private def rows = Seq(
    (1L, "HOMICIDE shooting", 10.0, 1, ts("2016-06-01 12:00:00")),
    (2L, "Auto theft", 55.0, 0, ts("2017-01-15 08:30:00")),
    (3L, "Armed robbery", 30.0, 1, ts("2015-03-10 22:10:00")),
  ).toDF("id", "description", "amount", "flag", "datetime")

  private def ids(spec: FilterSpec): Seq[Long] =
    rows.where(spec.compile).select("id").as[Long].collect().sorted.toSeq

  test("Q1 match_all keeps everything") {
    assert(ids(FilterSpec.MatchAll) === Seq(1L, 2L, 3L))
  }

  test("Q2 numeric range is inclusive both ends") {
    assert(ids(FilterSpec.NumericRange("amount", 10, 30)) === Seq(1L, 3L))
  }

  test("Q3 enum-in") {
    assert(ids(FilterSpec.EnumIn("description", Seq("Auto theft", "Armed robbery"))) === Seq(2L, 3L))
  }

  test("Q4 boolean equality") {
    assert(ids(FilterSpec.BoolEq("flag", 1)) === Seq(1L, 3L))
  }

  test("Q5 datetime range in epoch millis") {
    val spec = FilterSpec.DateTimeRange("datetime",
      ts("2016-01-01 00:00:00").getTime, ts("2017-12-31 00:00:00").getTime)
    assert(ids(spec) === Seq(1L, 2L))
  }

  test("Q6 phrase prefix is case-insensitive and prefix-matches the last token") {
    assert(ids(FilterSpec.PhrasePrefix("description", "homicide shoot")) === Seq(1L))
    assert(ids(FilterSpec.PhrasePrefix("description", "armed rob")) === Seq(3L))
    // non-contiguous tokens don't match
    assert(ids(FilterSpec.PhrasePrefix("description", "homicide armed")) === Seq())
  }

  test("Q7 conjunction ANDs members; empty conjunction is match_all") {
    val spec = FilterSpec.conjunction(Seq(
      FilterSpec.NumericRange("amount", 0, 60),
      FilterSpec.BoolEq("flag", 1)))
    assert(ids(spec) === Seq(1L, 3L))
    assert(FilterSpec.conjunction(Nil) === FilterSpec.MatchAll)
  }

  test("Q9 display text matches the webapp's Lucene-ish rendering") {
    assert(FilterSpec.NumericRange("year", 2000, 2017).render === "year:>=2000 AND year:<=2017")
    assert(FilterSpec.EnumIn("city", Seq("a b", "c")).render === """( city:"a b" OR city:"c")""")
    assert(FilterSpec.EnumIn("city", Seq("x")).render === """ city:"x"""")
    assert(FilterSpec.BoolEq("gang_related", 1).render === "gang_related:1")
    assert(FilterSpec.PhrasePrefix("description", "auto th").render === """description:"* auto th*"""")
    assert(FilterSpec.And(Seq(FilterSpec.BoolEq("f", 0), FilterSpec.MatchAll)).render === "f:0 AND *")
    // field names with spaces are escaped
    assert(FilterSpec.NumericRange("a b", 1, 2).render === """a\ b:>=1 AND a\ b:<=2""")
  }

  test("TermsSet: per-document minimum_should_match, null threshold never matches") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "dup merge vector scan", Some(4)),  // all four -> meets 4
      (2L, "dup merge other words", Some(2)),  // two hits, needs 2
      (3L, "dup alone here", Some(2)),         // one hit, needs 2 -> out
      (4L, "dup merge vector", Some(2)),       // three hits, needs 2
      (5L, "dup merge vector scan", None),     // null threshold -> never
    ).toDF("id", "text", "req")
    val spec = FilterSpec.TermsSet("text", Seq("dup", "merge", "vector", "scan"), "req")
    assert(docs.where(spec.compile).select("id").as[Long].collect().sorted.toSeq
      === Seq(1L, 2L, 4L))
    assert(spec.render === "text:(dup merge vector scan)~@req")
    assert(spec.fields === Seq("text", "req"))
    intercept[IllegalArgumentException](FilterSpec.TermsSet("text", Seq.empty, "req"))
  }
}
