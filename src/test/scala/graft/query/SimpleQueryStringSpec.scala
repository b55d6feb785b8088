package graft.query

import graft.SparkSpecBase

/** simple_query_string: the never-throws grammar — operators, flags, and
  * every pinned degradation rule from the scaladoc contract.
  */
class SimpleQueryStringSpec extends SparkSpecBase {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox"),
    (2L, "quick silver lining"),
    (3L, "brown paper bag"),
    (4L, "slow red fox"),
    (5L, "quik brown fix"),
  ).toDF("id", "text")

  private def ids(q: String, op: String = "or",
      flags: Set[String] = SimpleQueryString.AllFlags): Seq[Long] =
    docs.where(SimpleQueryString.parse(q, "text", op, flags).compile)
      .select("id").as[Long].collect().sorted.toSeq

  test("default operator OR between adjacent terms; AND opt-in") {
    assert(ids("quick fox") === Seq(1L, 2L, 4L))
    assert(ids("quick fox", op = "and") === Seq(1L))
    assert(ids("quick +brown") === Seq(1L)) // + forces the conjunction
  }

  test("no precedence: clauses fold strictly left-to-right (Lucene buildQueryTree)") {
    // default OR: a +b | c == (a AND b) OR c — the left fold
    assert(ids("quick +brown | paper") === Seq(1L, 3L))
    // default AND: a b | c == (a AND b) OR c
    assert(ids("quick brown | paper", op = "and") === Seq(1L, 3L))
    // THE distinguishing shape: a | b c under default AND is
    // (a OR b) AND c — an AND-binds-tighter grammar would read it as
    // a OR (b AND c) and also admit doc 2 (quick silver lining)
    assert(ids("quick | paper brown", op = "and") === Seq(1L, 3L))
  }

  test("- negates the single clause after it; the complement folds like any clause") {
    // fox OR (NOT slow) under default OR — Lucene's MatchAll-SHOULD wrap
    // makes the negation self-contained, and OR-ing it in matches nearly
    // everything (the documented ES gotcha)
    assert(ids("fox -slow") === Seq(1L, 2L, 3L, 4L, 5L))
    // under default AND it is the useful form: fox AND NOT slow
    assert(ids("fox -slow", op = "and") === Seq(1L))
    // only negations -> the complement (ES's -foo behavior)
    assert(ids("-fox") === Seq(2L, 3L, 5L))
    assert(ids("--fox") === Seq(1L, 4L)) // double negation cancels
    assert(ids("(quick | paper) +brown", op = "or") === Seq(1L, 3L))
  }

  test("phrases, slop, and prefix terms") {
    assert(ids("\"brown fox\"") === Seq(1L))
    assert(ids("\"quick fox\"~1") === Seq(1L)) // one gap allowed
    assert(ids("qui*") === Seq(1L, 2L, 5L))
  }

  test("fuzzy ~N uses Damerau with the Lucene bound; ~7 clamps to 2") {
    assert(ids("quik~1") === Seq(1L, 2L, 5L)) // quick/quik within 1 edit
    assert(ids("quik~7") === ids("quik~2"))
  }

  test("degradation: unterminated quote, unmatched parens, dangling operators, empty query") {
    assert(ids("\"brown fox") === Seq(1L)) // quote runs to end
    assert(ids("brown fox)") === ids("brown fox")) // stray ) dropped
    assert(ids("(brown fox") === ids("brown fox")) // unclosed group to end
    assert(ids("brown +") === ids("brown")) // dangling + dropped
    assert(ids("| brown") === ids("brown")) // leading | dropped
    assert(ids("()") === Seq(1L, 2L, 3L, 4L, 5L)) // empty group -> match_all
    assert(ids("") === Seq(1L, 2L, 3L, 4L, 5L))
    assert(ids("!!! ...") === Seq(1L, 2L, 3L, 4L, 5L)) // unanalyzable drops
    assert(ids("fox ~ bag") === Seq(1L, 3L, 4L)) // bare ~ is literal (dropped by analysis)
  }

  test("disabled flags turn operator characters into text") {
    // with AND off, + glues into the term; analysis splits the compound
    // into its word tokens, conjoined within the single clause
    assert(ids("quick+brown", flags = Set("OR", "NOT")) === Seq(1L))
    // PHRASE off: quotes are ordinary characters (stripped by analysis)
    assert(ids("\"brown fox\"", flags = SimpleQueryString.AllFlags - "PHRASE") ===
      Seq(1L, 3L, 4L, 5L)) // brown OR fox, not the phrase (doc5 has brown)
    // escape always works
    assert(ids("brown \\+fox") === ids("brown fox"))
  }

  test("parseFields: text clauses match in ANY field; structure stays per-clause") {
    val two = Seq(
      (1L, "the quick brown fox", "alpha"),
      (2L, "silver lining", "quick"),   // quick only in the tag field
      (3L, "brown paper bag", "beta"),
      (4L, "slow red fox", "quick fox"),
    ).toDF("id", "text", "tag")
    def ids(q: String, op: String = "or"): Seq[Long] =
      two.where(SimpleQueryString.parseFields(q, Seq("text", "tag"), op).compile)
        .select("id").as[Long].collect().sorted.toSeq
    assert(ids("quick") === Seq(1L, 2L, 4L)) // either field
    assert(ids("quick +brown") === Seq(1L)) // the AND is per-clause
    assert(ids("\"quick fox\"") === Seq(4L)) // phrase in the tag field only
    assert(ids("qui*") === Seq(1L, 2L, 4L))
    assert(ids("fox -quick", op = "and") === Seq.empty) // every fox doc has quick somewhere
    // single-field parseFields ≡ parse
    val q = "\"brown fox\" | qui* -slow"
    assert(two.where(SimpleQueryString.parseFields(q, Seq("text"), "and").compile)
      .select("id").as[Long].collect().sorted.toSeq ===
      two.where(SimpleQueryString.parse(q, "text", "and").compile)
        .select("id").as[Long].collect().sorted.toSeq)
    intercept[IllegalArgumentException](
      SimpleQueryString.parseFields("x", Seq.empty))
  }

  test("strict arguments still validate (the query is lenient, the API is not)") {
    intercept[IllegalArgumentException](SimpleQueryString.parse("x", "text", "xor"))
    intercept[IllegalArgumentException](
      SimpleQueryString.parse("x", "text", "or", Set("NOPE")))
  }
}
