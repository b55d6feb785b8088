package graft.query

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** The Kibana search bar: query_string grammar → FilterSpec compilation
  * (round-13 fifth batch). Parser shape, precedence, clause semantics,
  * the sloppy-phrase ordered contract, fuzzy matching, and the SymSpell
  * deletion-index equivalence proof obligation.
  */
class QueryStringSpec extends SparkSpecBase {
  import spark.implicits._

  private def docs = Seq(
    (1L, "spark batch scan table", "en", "src1", Some("a")),
    (2L, "scan spark merge", "en", "src12", Some("b")),
    (3L, "vector scan dup table", "fr", "web", None),
    (4L, "spark row group filter scan", "zh", "s3", Some("c")),
    (5L, "dup dupes duped", "en", "src2", None),
  ).toDF("id", "text", "lang", "source", "opt")

  private def ids(spec: FilterSpec): Seq[Long] =
    docs.where(spec.compile).select("id").as[Long].collect().sorted.toSeq

  private def parse(q: String): FilterSpec =
    QueryString.parse(q, defaultField = "text")

  // ===== parser shape =====

  test("precedence: NOT > AND > OR, adjacency is OR, parens group") {
    // a AND b OR c == (a AND b) OR c
    assert(parse("lang:en AND text:merge OR text:dup") ===
      FilterSpec.Or(Seq(
        FilterSpec.And(Seq(
          FilterSpec.TermMatch("lang", "en"), FilterSpec.TermMatch("text", "merge"))),
        FilterSpec.TermMatch("text", "dup"))))
    // adjacency == OR (Lucene default_operator)
    assert(parse("dup merge") ===
      FilterSpec.Or(Seq(
        FilterSpec.TermMatch("text", "dup"), FilterSpec.TermMatch("text", "merge"))))
    // NOT binds to the immediately following clause
    assert(parse("NOT lang:en AND text:scan") ===
      FilterSpec.And(Seq(
        FilterSpec.Not(FilterSpec.TermMatch("lang", "en")),
        FilterSpec.TermMatch("text", "scan"))))
    // parens override
    assert(parse("lang:en AND (text:merge OR text:dup)") ===
      FilterSpec.And(Seq(
        FilterSpec.TermMatch("lang", "en"),
        FilterSpec.Or(Seq(
          FilterSpec.TermMatch("text", "merge"), FilterSpec.TermMatch("text", "dup"))))))
  }

  test("clause forms classify: term, prefix, wildcard, exists, range, fuzzy, phrase, slop") {
    assert(parse("text:dup*") === FilterSpec.AnalyzedPrefix("text", "dup"))
    assert(parse("source:s?c1*") === FilterSpec.Wildcard("source", "s?c1*"))
    assert(parse("opt:*") === FilterSpec.Exists("opt"))
    assert(parse("*") === FilterSpec.MatchAll)
    assert(parse("id:[2 TO 4}") ===
      FilterSpec.TermRange("id", Some("2"), Some("4"), loInclusive = true, hiInclusive = false))
    assert(parse("id:[* TO 3]") ===
      FilterSpec.TermRange("id", None, Some("3")))
    assert(parse("text:dupe~1") === FilterSpec.FuzzyTerm("text", "dupe", 1))
    assert(parse("text:dupe~") === FilterSpec.FuzzyTerm("text", "dupe", 2))
    assert(parse("""text:"vector scan"""") === FilterSpec.Phrase("text", "vector scan"))
    assert(parse("""text:"spark scan"~2""") === FilterSpec.PhraseSlop("text", "spark scan", 2))
    // the span/intervals proximity family's typable forms
    assert(parse("""text:"spark scan"~span2""") ===
      FilterSpec.SpanNear("text", Seq("spark", "scan"), 2, inOrder = true))
    assert(parse("""text:"spark scan"~near4""") ===
      FilterSpec.SpanNear("text", Seq("spark", "scan"), 4, inOrder = false))
    assert(parse("""text:"spark scan"~gaps3""") ===
      FilterSpec.IntervalsMatch("text", "spark scan", 3, ordered = true))
    assert(parse("""text:"spark scan"~any1""") ===
      FilterSpec.IntervalsMatch("text", "spark scan", 1, ordered = false))
    intercept[IllegalArgumentException](parse("""text:"a b"~woo2"""))
    intercept[IllegalArgumentException](parse("""text:"a b"~near"""))
    assert(QueryString.parse("text:dup*", "text", analyzeWildcard = false) ===
      FilterSpec.Wildcard("text", "dup*"))
    assert(parse("") === FilterSpec.MatchAll)
  }

  test("escaped wildcard chars stay literal inside a live-wildcard clause") {
    // a\*b? mixes an escaped * (literal) with a live ? — the compiled
    // pattern keeps the backslash so Wildcard.toLike renders the escaped
    // star as a literal asterisk, never a LIKE %
    assert(parse("""text:a\*b?""") === FilterSpec.Wildcard("text", """a\*b?"""))
    assert(FilterSpec.Wildcard.toLike("""a\*b?""") === "a*b_")
    assert(parse("""text:a\?b*c""") === FilterSpec.Wildcard("text", """a\?b*c"""))
    assert(FilterSpec.Wildcard.toLike("""a\?b*c""") === "a?b%c")
    // unescaped LIKE metachars in the pattern text are literals, escaped
    // for LIKE; a \-escaped backslash is one literal backslash
    assert(FilterSpec.Wildcard.toLike("""a%b_c*""") === """a\%b\_c%""")
    assert(FilterSpec.Wildcard.toLike("""a\\b*""") === """a\\b%""")
    // all wildcards escaped → no live wildcard at all → a literal term
    assert(parse("""text:a\*b""") === FilterSpec.TermMatch("text", "a*b"))
  }

  test("boostedTerms: the scoring path honors ^N; the filter path still rejects it") {
    assert(QueryString.boostedTerms("vector^2 dup scan^0.5") ===
      Seq("vector" -> 2.0, "dup" -> 1.0, "scan" -> 0.5))
    // duplicates collapse keeping the max boost, first-occurrence order
    assert(QueryString.boostedTerms("a b^3 a^2") ===
      Seq("a" -> 2.0, "b" -> 3.0))
    // an escaped caret is literal text — the analyzer strips it, no boost
    assert(QueryString.boostedTerms("""a\^2""") === Seq("a" -> 1.0, "2" -> 1.0))
    // structure is the filter path's job; malformed boosts are loud
    for (bad <- Seq("a AND b", "(a b)", "text:a^2", "a^", "a^x", "a^2^3", ""))
      intercept[IllegalArgumentException](QueryString.boostedTerms(bad))
    // and the FILTER path keeps rejecting live boosts
    intercept[IllegalArgumentException](parse("text:a^2"))
  }

  test("hasBoost: the /search dispatch sees only unescaped carets in units") {
    assert(QueryString.hasBoost("vector^2 dup"))
    assert(QueryString.hasBoost("dup^2 AND vector")) // boosted + structure →
    // boostedTerms then rejects it loudly downstream
    assert(!QueryString.hasBoost("dup vector"))
    assert(!QueryString.hasBoost("dup AND vector")) // caret-free structure
    // stays on the tolerant bag-of-words path (pre-boost route contract)
    assert(!QueryString.hasBoost("""a\^2"""))       // escaped caret is text
  }

  test("unsupported syntax errors loudly instead of silently dropping") {
    for (bad <- Seq("text:a^2", "text:\"open", "id:[1 TO]", "a AND",
        "text:a\\", "+ text:a", "-", "text:/unterminated", "text://",
        "text:a/b"))
      intercept[IllegalArgumentException](parse(bad))
  }

  test("regexp literal: full-value anchored match, escapes reconstructed") {
    assert(parse("source:/src1[0-9]/") === FilterSpec.Regexp("source", "src1[0-9]"))
    // anchored: src1 itself must NOT match /src1[0-9]/ (full-value), and
    // src12 must
    assert(ids(parse("source:/src1[0-9]/")) === Seq(2L))
    assert(ids(parse("source:/src./")) === Seq(1L, 5L)) // src1, src2 — not src12
    assert(ids(parse("source:/s.*/")) === Seq(1L, 2L, 4L, 5L))
    // backslash classes survive the scanner's escape decoding
    assert(parse("""source:/src\d+/""") === FilterSpec.Regexp("source", """src\d+"""))
    assert(ids(parse("""source:/src\d+/""")) === Seq(1L, 2L, 5L))
    // a bare regex hits the default field; whitespace rides inside a
    // character class (the unit scanner splits on bare spaces)
    assert(parse("/dup[ ].*/") === FilterSpec.Regexp("text", "dup[ ].*"))
    assert(ids(parse("/dup[ ].*/")) === Seq(5L))
    // render round-trips
    val r = parse("source:/src1[0-9]/")
    assert(parse(r.render) === r)
  }

  test("backslash escapes make reserved characters literal term text") {
    // separators, operators, wildcards, fuzzy markers — all literal when
    // escaped; the analyzer then folds them like ES's analyzed match
    assert(parse("""text:3\:00""") === FilterSpec.TermMatch("text", "3:00"))
    assert(parse("""text:key\-agg""") === FilterSpec.TermMatch("text", "key-agg"))
    assert(parse("""text:big\ vector""") === FilterSpec.TermMatch("text", "big vector"))
    assert(parse("""text:a\*b""") === FilterSpec.TermMatch("text", "a*b"))
    assert(parse("""text:a\~2""") === FilterSpec.TermMatch("text", "a~2"))
    assert(parse("""text:a\\b""") === FilterSpec.TermMatch("text", "a\\b"))
    // escaped char in a prefix clause: the trailing * still analyzes
    assert(parse("""text:a\-b*""") === FilterSpec.AnalyzedPrefix("text", "a-b"))
    // an escaped field separator keeps the whole unit on the default field
    assert(parse("""a\:b""") === FilterSpec.TermMatch("text", "a:b"))
    // escaped operator words are terms
    assert(parse("""\AND""") === FilterSpec.TermMatch("text", "AND"))
    // escaped * is a literal-asterisk term, not exists/match_all
    assert(parse("""text:\*""") === FilterSpec.TermMatch("text", "*"))
    // compiled semantics: the analyzer folds the literal to token containment
    assert(ids(parse("""text:vector\ scan""")) === Seq(3L))
  }

  test("group minimum_should_match: (a b c)~2 compiles to an N-of-M sum") {
    val spec = parse("(text:dup text:merge text:scan)~2")
    assert(spec === FilterSpec.MinShouldMatch(2, Seq(
      FilterSpec.TermMatch("text", "dup"), FilterSpec.TermMatch("text", "merge"),
      FilterSpec.TermMatch("text", "scan"))))
    // docs matching >= 2 of {dup, merge, scan}: 2 (scan+merge), 3 (scan+dup)
    assert(ids(spec) === Seq(2L, 3L))
    // ~1 behaves as OR; ~3 requires all
    assert(ids(parse("(text:dup text:merge text:scan)~1")) ===
      ids(parse("text:dup OR text:merge OR text:scan")))
    assert(ids(parse("(text:dup text:vector text:scan)~3")) === Seq(3L))
    // render round-trips
    assert(parse(spec.render) === spec)
    // a single-clause group takes ~1
    assert(parse("(text:dup)~1") ===
      FilterSpec.MinShouldMatch(1, Seq(FilterSpec.TermMatch("text", "dup"))))
    // over-asking is a loud error, not a never-matching query
    intercept[IllegalArgumentException](parse("(text:dup text:merge)~3"))
    // an escaped tilde stays a term
    assert(parse("""(text:dup text:merge) \~2""") ===
      FilterSpec.Or(Seq(
        FilterSpec.Or(Seq(FilterSpec.TermMatch("text", "dup"),
          FilterSpec.TermMatch("text", "merge"))),
        FilterSpec.TermMatch("text", "~2"))))
  }

  test("minimum_should_match spec grammar: percents, negatives, conditionals") {
    import FilterSpec.MinShouldMatch.resolve
    // the ES documentation's own forms, against static clause counts
    assert(resolve("3", 5) === 3)
    assert(resolve("-2", 5) === 3)    // 2 optional
    assert(resolve("75%", 4) === 3)   // floor(4·0.75)
    assert(resolve("75%", 5) === 3)   // floor(3.75) — rounded DOWN
    assert(resolve("-25%", 4) === 3)  // 4 − floor(1.0)
    assert(resolve("-25%", 9) === 7)  // 9 − floor(2.25)
    assert(resolve("3<90%", 3) === 3) // n ≤ k: all required
    assert(resolve("3<90%", 10) === 9)
    assert(resolve("3<-1", 10) === 9)
    // conditional CHAINS — the ES documentation's own multiple-combination
    // example `2<-25% 9<-3`: 1-2 clauses all required, 3-9 drop 25%,
    // 10+ drop 3; the LARGEST k below n picks the spec, in any order
    assert(resolve("2<-25% 9<-3", 2) === 2)   // at the bound: all
    assert(resolve("2<-25% 9<-3", 3) === 3)   // 3 − ⌊0.75⌋
    assert(resolve("2<-25% 9<-3", 8) === 6)   // 8 − ⌊2.0⌋
    assert(resolve("2<-25% 9<-3", 9) === 7)   // 9 − ⌊2.25⌋ — still the 2< leg
    assert(resolve("2<-25% 9<-3", 10) === 7)  // the 9< leg takes over
    assert(resolve("2<-25% 9<-3", 24) === 21)
    assert(resolve("9<-3 2<-25%", 10) === 7)  // order-insensitive
    assert(resolve("3<2 6<50%", 4) === 2)     // positive specs chain too
    // degenerate results reject loudly (pure-OR or never-matching groups)
    intercept[IllegalArgumentException](resolve("10%", 4)) // floor(0.4) = 0
    intercept[IllegalArgumentException](resolve("-5", 4))
    intercept[IllegalArgumentException](resolve("7", 4))
    intercept[IllegalArgumentException](resolve("2<", 4))
    intercept[IllegalArgumentException](resolve("banana", 4))
    // a NESTED conditional is not the chain grammar (its left-to-right
    // reading would contradict ES's largest-k rule) — reject, never
    // silently accept with different semantics
    intercept[IllegalArgumentException](resolve("2<3<90%", 10))
    // chain faults: a non-conditional part, a repeated bound
    intercept[IllegalArgumentException](resolve("2<-25% 75%", 10))
    intercept[IllegalArgumentException](resolve("2<-25% 2<-3", 10))
    // the typable grammar carries the same forms on a group suffix
    assert(parse("(text:dup text:merge text:scan text:vector)~75%") ===
      parse("(text:dup text:merge text:scan text:vector)~3"))
    assert(parse("(text:dup text:merge text:scan)~-1") ===
      parse("(text:dup text:merge text:scan)~2"))
    assert(parse("(text:dup text:merge text:scan text:vector)~2<50%") ===
      parse("(text:dup text:merge text:scan text:vector)~2"))
    intercept[IllegalArgumentException](
      parse("(text:dup text:merge)~10%"))
  }

  test("+/- occurrence prefixes follow the Lucene matching rule") {
    // pure should level stays OR; -x excludes with the should constraining
    assert(parse("text:dup -source:src1*") ===
      FilterSpec.And(Seq(
        FilterSpec.TermMatch("text", "dup"),
        FilterSpec.Not(FilterSpec.AnalyzedPrefix("source", "src1")))))
    assert(ids(parse("text:dup -source:src1*")) === Seq(3L, 5L))
    // with a MUST present, shoulds stop constraining (scoring-only)
    assert(parse("text:dup +lang:en") === FilterSpec.TermMatch("lang", "en"))
    assert(ids(parse("text:dup +lang:en")) === Seq(1L, 2L, 5L))
    // several shoulds against one must-not: at least one should must match
    assert(parse("text:dup text:merge -lang:fr") ===
      FilterSpec.And(Seq(
        FilterSpec.Or(Seq(
          FilterSpec.TermMatch("text", "dup"), FilterSpec.TermMatch("text", "merge"))),
        FilterSpec.Not(FilterSpec.TermMatch("lang", "fr")))))
    assert(ids(parse("text:dup text:merge -lang:fr")) === Seq(2L, 5L))
    // pure negative matches everything except (the ES behavior)
    assert(parse("-text:dup") === FilterSpec.Not(FilterSpec.TermMatch("text", "dup")))
    assert(ids(parse("-text:dup")) === Seq(1L, 2L, 4L))
    // group prefixes
    assert(parse("-(text:dup OR text:merge) text:scan") ===
      FilterSpec.And(Seq(
        FilterSpec.TermMatch("text", "scan"),
        FilterSpec.Not(FilterSpec.Or(Seq(
          FilterSpec.TermMatch("text", "dup"), FilterSpec.TermMatch("text", "merge")))))))
    assert(parse("+(text:dup text:merge)") ===
      FilterSpec.Or(Seq(
        FilterSpec.TermMatch("text", "dup"), FilterSpec.TermMatch("text", "merge"))))
    // an AND chain containing a modifier surfaces as MUST at the or level
    assert(parse("lang:en AND -text:dup text:scan") ===
      FilterSpec.And(Seq(
        FilterSpec.TermMatch("lang", "en"),
        FilterSpec.Not(FilterSpec.TermMatch("text", "dup")))))
    // NOT stays the boolean complement: adjacency ORs it (documented delta)
    assert(parse("text:dup NOT lang:fr") ===
      FilterSpec.Or(Seq(
        FilterSpec.TermMatch("text", "dup"),
        FilterSpec.Not(FilterSpec.TermMatch("lang", "fr")))))
    // a leading escaped +/- is literal term text, not an operator
    assert(parse("""\-foo""") === FilterSpec.TermMatch("text", "-foo"))
  }

  test("render round-trips the Lucene-ish display text") {
    assert(parse("lang:en AND (text:merge OR text:dup)").render ===
      "lang:en AND (text:merge OR text:dup)")
    assert(parse("""NOT text:"spark scan"~2""").render === """NOT text:"spark scan"~2""")
    assert(parse("id:[* TO 3]").render === "id:[* TO 3]")
  }

  // ===== compiled semantics =====

  test("term / prefix / phrase / exists / wildcard / range compile correctly") {
    assert(ids(parse("text:scan")) === Seq(1L, 2L, 3L, 4L))
    assert(ids(parse("text:dup")) === Seq(3L, 5L)) // whole token, not substring
    assert(ids(parse("text:dup*")) === Seq(3L, 5L)) // dup, dupes, duped
    assert(ids(parse("""text:"vector scan"""")) === Seq(3L))
    assert(ids(parse("opt:*")) === Seq(1L, 2L, 4L))
    assert(ids(parse("source:src1*")) === Seq(1L, 2L)) // analyzed prefix
    assert(ids(parse("source:s?c1*")) === Seq(1L, 2L)) // raw-field LIKE
    assert(ids(parse("source:src?")) === Seq(1L, 5L)) // exactly one char
    assert(ids(parse("id:[2 TO 4}")) === Seq(2L, 3L))
    assert(ids(parse("id:{2 TO *]")) === Seq(3L, 4L, 5L))
    // non-numeric bounds compare lexically
    assert(ids(parse("source:[src1 TO src2]")) === Seq(1L, 2L, 5L))
  }

  test("NOT matches null-valued rows (Lucene must_not semantics, not SQL three-valued)") {
    assert(ids(parse("NOT opt:a")) === Seq(2L, 3L, 4L, 5L)) // 3 and 5 have null opt
    assert(ids(parse("NOT opt:*")) === Seq(3L, 5L))
  }

  test("sloppy phrase: ordered within slop, exact at the boundary, no transpositions") {
    // doc 1: spark(0) … scan(2): gap 1
    // doc 2: scan(0) spark(1): reversed — the documented ordered-only delta
    // doc 4: spark(0) … scan(4): gap 3
    assert(ids(parse("""text:"spark scan"~0""")) === Seq())
    assert(ids(parse("""text:"spark scan"~1""")) === Seq(1L))
    assert(ids(parse("""text:"spark scan"~3""")) === Seq(1L, 4L))
    assert(ids(parse("""text:"scan spark"~0""")) === Seq(2L))
    // three terms: total displacement p_n - p_1 - (n-1) pooled, not per-gap
    val three = Seq((10L, "a x b y c")).toDF("id", "text")
    def hit(q: String): Seq[Long] =
      three.where(parse(q).compile).select("id").as[Long].collect().toSeq
    assert(hit("""text:"a b c"~2""") === Seq(10L))
    assert(hit("""text:"a b c"~1""") === Seq())
    // repeated query term needs distinct increasing positions
    val rep = Seq((11L, "batch merge batch")).toDF("id", "text")
    assert(rep.where(parse("""text:"batch batch"~1""").compile).count() === 1)
    assert(rep.where(parse("""text:"batch batch"~0""").compile).count() === 0)
  }

  test("Damerau fuzzy: a transposition costs one edit; the full variant, not OSA") {
    import org.apache.spark.unsafe.types.UTF8String
    def d(a: String, b: String): Int =
      graft.expr.DamerauAlgo.distance(
        UTF8String.fromString(a), UTF8String.fromString(b))
    // the quadruple probed against DuckDB's damerau_levenshtein — same
    // unrestricted variant (OSA would give 3 for the first)
    assert(d("ca", "abc") === 2)
    assert(d("ab", "ba") === 1)
    assert(d("abcdef", "abcfad") === 3)
    assert(d("a cat", "an abct") === 3)
    assert(d("", "abc") === 3 && d("abc", "") === 3 && d("same", "same") === 0)
    // FuzzyTerm: 'tbale'~1 reaches 'table' only when transpositions count
    assert(ids(FilterSpec.FuzzyTerm("text", "tbale", 1, transpositions = true))
      === Seq(1L, 3L)) // docs 1 and 3 contain 'table'
    assert(ids(FilterSpec.FuzzyTerm("text", "tbale", 1)) === Seq())
    // registered as a SQL function too
    graft.GraftExtensions.register(spark)
    assert(spark.sql("SELECT damerau_levenshtein('ca', 'abc')")
      .collect()(0).getInt(0) === 2)
  }

  test("fuzzy term: bounded levenshtein over analyzed tokens, prefixLength pins the head") {
    assert(ids(parse("text:dupe~1")) === Seq(3L, 5L)) // dup, dupes, duped at 1 edit
    assert(ids(parse("text:dupe~0")) === Seq())
    assert(ids(parse("text:spark~1")) === Seq(1L, 2L, 4L))
    // prefixLength: 'mark'~2 reaches 'merge'? lev=3 no; 'mark'~2 vs 'spark' lev=2 yes,
    // but prefixLength=1 requires leading 'm'
    assert(ids(FilterSpec.FuzzyTerm("text", "mark", 2)) === Seq(1L, 2L, 4L))
    assert(ids(FilterSpec.FuzzyTerm("text", "mark", 2, prefixLength = 1)) === Seq())
  }

  // ===== SymSpell deletion index ≡ brute-force scan =====

  test("deletion neighborhood hand values") {
    assert(Fuzzy.deletionNeighborhood("ab", 1).toSet === Set("ab", "b", "a"))
    assert(Fuzzy.deletionNeighborhood("abc", 2).toSet ===
      Set("abc", "ab", "ac", "bc", "a", "b", "c"))
    assert(Fuzzy.deletionNeighborhood("ab", 0) === Seq("ab"))
  }

  test("indexed fuzzy equals the scan twin on the corpus, maxEdits 1 and 2") {
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for (k <- Seq(1, 2); term <- Seq("dupe", "scane", "vectr")) {
      val scan = corpus.where(FilterSpec.FuzzyTerm("text", term, k).compile)
        .select("doc_id").as[Long].collect().sorted.toSeq
      val indexed = Fuzzy.fuzzyDocs(corpus, "text", term, k)
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(indexed === scan, s"term=$term maxEdits=$k")
    }
    // prefixLength threads through both paths identically
    val scanP = corpus.where(FilterSpec.FuzzyTerm("text", "vectr", 2, 2).compile)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val idxP = Fuzzy.fuzzyDocs(corpus, "text", "vectr", 2, prefixLength = 2)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(idxP === scanP)
  }

  test("the webapp's own dict_field:* query parses and compiles (collections.js:79)") {
    val spec = QueryString.parse("dict_field:*", defaultField = "dict_field")
    assert(spec === FilterSpec.Exists("dict_field"))
    val dict = Seq((Some("a"), 1), (None, 2)).toDF("dict_field", "n")
    assert(dict.where(spec.compile).count() === 1)
  }

  test("parseFields: bare clauses match ANY field, explicit field: clauses unaffected") {
    val two = Seq(
      (1L, "merge sort notes", "alpha", "en"),
      (2L, "silver lining", "merge", "en"),
      (3L, "brown paper", "beta", "en"),
      (4L, "merge vector", "gamma", "de"),
    ).toDF("id", "text", "tag", "lang")
    def ids(q: String): Seq[Long] =
      two.where(QueryString.parseFields(q, Seq("text", "tag")).compile)
        .select("id").as[Long].collect().sorted.toSeq
    assert(ids("merge") === Seq(1L, 2L, 4L)) // either field
    assert(ids("mer*") === Seq(1L, 2L, 4L)) // analyzed prefix over both
    assert(ids("merge AND lang:en") === Seq(1L, 2L)) // field: clause exact
    assert(ids("\"merge sort\"") === Seq(1L)) // phrase per field
    // single-field parseFields ≡ parse
    assert(QueryString.parseFields("a OR b:c", Seq("f")) ===
      QueryString.parse("a OR b:c", "f"))
    intercept[IllegalArgumentException](QueryString.parseFields("x", Seq.empty))
  }
}
