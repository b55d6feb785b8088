package graft.query

import graft.SparkSpecBase

/** KQL grammar: keywords, field:value shapes, value groups, ranges,
  * escapes, the default-field seam, and the stated deltas (no fuzzy/
  * boost/regex — strict rejects, unlike simple_query_string's leniency).
  */
class KqlSpec extends SparkSpecBase {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox", "en", 10L),
    (2L, "quick silver lining", "en", 25L),
    (3L, "brown paper bag", "de", 30L),
    (4L, "slow red fox", null.asInstanceOf[String], 5L),
  ).toDF("id", "text", "lang", "n")

  private def ids(q: String, default: Option[String] = Some("text")): Seq[Long] =
    docs.where(Kql.parse(q, default).compile)
      .select("id").as[Long].collect().sorted.toSeq

  test("keywords are case-insensitive with not > and > or precedence; parens group") {
    assert(ids("quick AND brown") === Seq(1L))
    assert(ids("quick and brown") === Seq(1L))
    assert(ids("quick Or paper") === Seq(1L, 2L, 3L))
    // a or b and c == a or (b and c)
    assert(ids("paper or quick and brown") === Seq(1L, 3L))
    assert(ids("(paper or quick) and brown") === Seq(1L, 3L))
    assert(ids("not quick") === Seq(3L, 4L))
    assert(ids("not quick and fox") === Seq(4L)) // (not quick) and fox
  }

  test("field:value, phrases, prefix, wildcard, exists, value groups") {
    assert(ids("lang:en") === Seq(1L, 2L))
    assert(ids("text:\"brown fox\"") === Seq(1L)) // phrase, not bag
    assert(ids("text:qui*") === Seq(1L, 2L)) // analyzed prefix
    assert(ids("text:*silver*") === Seq(2L)) // mid-star raw full-value wildcard
    // unquoted multi-word value = ONE analyzed match, any term may appear
    assert(ids("text:paper fox") === Seq(1L, 3L, 4L))
    assert(ids("lang:*") === Seq(1L, 2L, 3L)) // exists (doc4 lang null)
    assert(ids("lang:(en or de)") === Seq(1L, 2L, 3L))
    assert(ids("text:(quick and not silver)") === Seq(1L))
    assert(ids("*") === Seq(1L, 2L, 3L, 4L)) // lone star = match_all
  }

  test("range comparisons compile one-sided TermRange, numeric literals typed") {
    assert(ids("n > 10") === Seq(2L, 3L))
    assert(ids("n >= 10") === Seq(1L, 2L, 3L))
    assert(ids("n < 10") === Seq(4L))
    assert(ids("n <= 5") === Seq(4L))
    assert(ids("n >= 10 and lang:en") === Seq(1L, 2L))
  }

  test("bare terms need the default field; escapes neutralize structure") {
    val e = intercept[IllegalArgumentException](Kql.parse("quick", None))
    assert(e.getMessage.contains("default field"))
    // field clauses work without a default
    assert(ids("lang:en", default = None) === Seq(1L, 2L))
    // escaped colon keeps the word one term (analysis then splits it)
    assert(ids("""text\:quick""") === ids("text quick", Some("text")))
    // escaped star is literal (no wildcard): no doc contains "qui*"
    assert(ids("""qui\*""") === Seq.empty)
    // quoted keywords are literal phrases, not operators
    assert(ids("\"quick brown\" or paper") === Seq(1L, 3L))
  }

  test("strict grammar: malformed shapes reject loudly (KQL is not never-throws)") {
    intercept[IllegalArgumentException](Kql.parse("\"unterminated", Some("text")))
    intercept[IllegalArgumentException](Kql.parse("(quick", Some("text")))
    intercept[IllegalArgumentException](Kql.parse("quick and", Some("text")))
    intercept[IllegalArgumentException](Kql.parse("n >", Some("text")))
    intercept[IllegalArgumentException](Kql.parse("lang:(en or)", Some("text")))
    // escaped braces are text
    assert(ids("""qui\{ck""") === Seq.empty) // literal { never matches
    // empty query is match_all (Kibana's empty bar)
    assert(ids("") === Seq(1L, 2L, 3L, 4L))
  }

  test("nested braces: every condition on the SAME element (the nested-vs-object divergence)") {
    val items = Seq(
      (1L, "widget", 1L), (1L, "gadget", 5L), // parent 1: widget@1, gadget@5
      (2L, "widget", 9L))
      .toDF("oid", "product", "qty")
    val parents = NestedDocs.nest(items, "oid", Seq("product", "qty"), as = "items")
    def hits(q: String): Seq[Long] =
      parents.where(Kql.parse(q, None).compile).select("oid").as[Long].collect().sorted.toSeq
    // the defining case: parent 1 HAS a widget and HAS qty>2, but not on
    // the same element — nested semantics exclude it
    assert(hits("items:{ product:widget and qty > 2 }") === Seq(2L))
    assert(hits("items:{ product:widget }") === Seq(1L, 2L))
    assert(hits("items:{ qty >= 5 }") === Seq(1L, 2L))
    assert(hits("items:{ product:(widget or gadget) and qty < 2 }") === Seq(1L))
    assert(hits("items:{ not product:widget }") === Seq(1L)) // SOME non-widget element
    assert(hits("items:{ product:wid* }") === Seq(1L, 2L)) // analyzed prefix on the element
    assert(hits("items:{ product:* }") === Seq(1L, 2L)) // element-field exists
    assert(hits("""items:{ product:"widget" and qty <= 1 }""") === Seq(1L)) // phrase + range
    // composes with the outer boolean grammar
    assert(hits("items:{ qty > 8 } or items:{ qty < 2 }") === Seq(1L, 2L))
    assert(hits("not items:{ qty > 8 }") === Seq(1L))
    // loud rejects: bare term (no default field inside a doc), double
    // nesting, mid-value wildcard
    assert(intercept[IllegalArgumentException](Kql.parse("items:{ widget }", Some("text")))
      .getMessage.contains("no default field inside"))
    assert(intercept[IllegalArgumentException](Kql.parse("items:{ a:{ b:1 } }", Some("text")))
      .getMessage.contains("do not nest"))
    assert(intercept[IllegalArgumentException](Kql.parse("items:{ product:*dget* }", Some("text")))
      .getMessage.contains("mid-value"))
    assert(intercept[IllegalArgumentException](Kql.parse("items:{ qty > 1", Some("text")))
      .getMessage.contains("expected '}'"))
  }
}
