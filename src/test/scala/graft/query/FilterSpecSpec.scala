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

  test("SpanNear: gap budget, order flag, repeated terms need distinct occurrences") {
    val docs = Seq(
      (1L, "alpha x beta"),        // alpha..beta gap 1, ordered
      (2L, "beta x x alpha"),      // reversed, gap 2
      (3L, "alpha x x x x x beta"),// ordered but gap 5
      (4L, "alpha beta"),          // adjacent ordered
      (5L, "alpha only here"),     // beta missing
      (6L, "gamma alpha gamma"),   // two gammas around alpha
      (7L, "gamma alpha delta"),   // ONE gamma — a repeated-term query must not reuse it
    ).toDF("id", "text")
    def ids(spec: FilterSpec): Seq[Long] =
      docs.where(spec.compile).select("id").as[Long].collect().sorted.toSeq
    // ordered (in_order): only forward arrangements inside the budget
    assert(ids(FilterSpec.SpanNear("text", Seq("alpha", "beta"), 2, inOrder = true))
      === Seq(1L, 4L))
    // any order: the reversed doc 2 joins; doc 3 still out (gap 5 > 2)
    assert(ids(FilterSpec.SpanNear("text", Seq("alpha", "beta"), 2, inOrder = false))
      === Seq(1L, 2L, 4L))
    // wide budget admits doc 3
    assert(ids(FilterSpec.SpanNear("text", Seq("alpha", "beta"), 5, inOrder = true))
      === Seq(1L, 3L, 4L))
    // repeated term: needs TWO distinct gamma occurrences — doc 7's single
    // gamma must not satisfy both slots (ordered and unordered)
    assert(ids(FilterSpec.SpanNear("text", Seq("gamma", "gamma"), 3, inOrder = true))
      === Seq(6L))
    assert(ids(FilterSpec.SpanNear("text", Seq("gamma", "gamma"), 3, inOrder = false))
      === Seq(6L))
    assert(FilterSpec.SpanNear("text", Seq("a", "b"), 2, inOrder = true).render
      === """text:"a b"~span2""")
    assert(FilterSpec.SpanNear("text", Seq("a", "b"), 2, inOrder = false).render
      === """text:"a b"~near2""")
    intercept[IllegalArgumentException](
      FilterSpec.SpanNear("text", Seq.empty, 1, inOrder = true))
    intercept[IllegalArgumentException](
      FilterSpec.SpanNear("text", Seq("a"), -1, inOrder = true))
  }

  test("IntervalsMatch: analyzed phrase, max_gaps, ordered flag; 3-term window") {
    val docs = Seq(
      (1L, "one x two y three"),   // ordered, gaps 1+1 = 2
      (2L, "three two one"),       // fully reversed, width 3
      (3L, "two one x three"),     // scrambled, width 4 → gaps 1
      (4L, "one two"),             // three missing
    ).toDF("id", "text")
    def ids(spec: FilterSpec): Seq[Long] =
      docs.where(spec.compile).select("id").as[Long].collect().sorted.toSeq
    assert(ids(FilterSpec.IntervalsMatch("text", "one two three", 2, ordered = true))
      === Seq(1L))
    assert(ids(FilterSpec.IntervalsMatch("text", "one two three", 2, ordered = false))
      === Seq(1L, 2L, 3L))
    // gaps 0 unordered: only a contiguous window of the three terms
    assert(ids(FilterSpec.IntervalsMatch("text", "one two three", 0, ordered = false))
      === Seq(2L))
    assert(FilterSpec.IntervalsMatch("text", "a b", 2, ordered = true).render
      === """text:"a b"~gaps2""")
    assert(FilterSpec.IntervalsMatch("text", "a b", 2, ordered = false).render
      === """text:"a b"~any2""")
  }

  test("IntervalsAllOf: ordered phrase slots, alternatives, gap budget, no overlap") {
    val docs = Seq(
      (1L, "big vector then merge join here"), // [0,1]..[3,4]: gaps 1
      (2L, "merge join then big vector"),      // reversed → ordered fails
      (3L, "big vector merge join"),           // adjacent: gaps 0
      (4L, "big vector w x y z merge join"),   // gaps 4
      (5L, "big vector only"),                 // slot 2 missing
      (6L, "big vector scan"),                 // slot 2 via the 'scan' alternative, gaps 0
      (7L, "big vector scan merge join"),      // both alternatives present
    ).toDF("id", "text")
    def ids(spec: FilterSpec): Seq[Long] =
      docs.where(spec.compile).select("id").as[Long].collect().sorted.toSeq
    val slots = Seq(Seq("big vector"), Seq("merge join", "scan"))
    assert(ids(FilterSpec.IntervalsAllOf("text", slots, maxGaps = 1))
      === Seq(1L, 3L, 6L, 7L))
    assert(ids(FilterSpec.IntervalsAllOf("text", slots, maxGaps = 4))
      === Seq(1L, 3L, 4L, 6L, 7L))
    // chosen intervals must not overlap: "vector scan" starts INSIDE
    // "big vector" — s2 > e1 fails on the 3-token doc
    assert(ids(FilterSpec.IntervalsAllOf("text",
      Seq(Seq("big vector"), Seq("vector scan")), maxGaps = 9)) === Seq())
    // single slot degenerates to phrase existence
    assert(ids(FilterSpec.IntervalsAllOf("text", Seq(Seq("merge join")), 0))
      === Seq(1L, 2L, 3L, 4L, 7L))
    // three slots chain: big vector .. scan .. merge join (doc 7 only)
    assert(ids(FilterSpec.IntervalsAllOf("text",
      Seq(Seq("big vector"), Seq("scan"), Seq("merge join")), maxGaps = 0))
      === Seq(7L))
    assert(FilterSpec.IntervalsAllOf("text", slots, 2).render
      === """text:allof[("big vector") ("merge join" | "scan")]~gaps2""")
    intercept[IllegalArgumentException](FilterSpec.IntervalsAllOf("text", Seq.empty, 1))
    intercept[IllegalArgumentException](
      FilterSpec.IntervalsAllOf("text", Seq(Seq("a"), Seq.empty), 1))
    intercept[IllegalArgumentException](
      FilterSpec.IntervalsAllOf("text", Seq(Seq("a")), -1))
  }

  test("IntervalsAllOf unordered: any arrangement, overlaps allowed, minimal-interval algebra") {
    val docs = Seq(
      (1L, "big vector then merge join here"), // window 5, gaps 1
      (2L, "merge join then big vector"),      // reversed: unordered admits
      (3L, "merge join big vector"),           // adjacent reversed: gaps 0
      (4L, "merge join w x y big vector"),     // window 7, gaps 3
      (5L, "big vector only"),                 // slot 2 missing
    ).toDF("id", "text")
    def ids(spec: FilterSpec): Seq[Long] =
      docs.where(spec.compile).select("id").as[Long].collect().sorted.toSeq
    val slots = Seq(Seq("big vector"), Seq("merge join"))
    // ordered keeps its arrangement rule (reversed docs out)...
    assert(ids(FilterSpec.IntervalsAllOf("text", slots, 1)) === Seq(1L))
    // ...unordered admits any arrangement under the same gap algebra
    assert(ids(FilterSpec.IntervalsAllOf("text", slots, 1, ordered = false))
      === Seq(1L, 2L, 3L))
    assert(ids(FilterSpec.IntervalsAllOf("text", slots, 0, ordered = false))
      === Seq(3L))
    assert(ids(FilterSpec.IntervalsAllOf("text", slots, 3, ordered = false))
      === Seq(1L, 2L, 3L, 4L))
    // overlaps ALLOWED (Lucene unordered, not unorderedNoOverlaps): the
    // shared 'join' occurrence serves both slots — width 3 − Σwidths 4 =
    // gaps −1 passes at 0; the ordered form's s2 > e1 refuses it
    val ov = Seq((10L, "merge join batch")).toDF("id", "text")
    val ovSlots = Seq(Seq("merge join"), Seq("join batch"))
    assert(ov.where(FilterSpec.IntervalsAllOf("text", ovSlots, 0,
      ordered = false).compile).count() === 1)
    assert(ov.where(FilterSpec.IntervalsAllOf("text", ovSlots, 9).compile)
      .count() === 0)
    // same-term slots may even share ONE occurrence (the overlap-mode
    // delta from SpanNear's repeated-term distinctness, documented)
    val rep = Seq((11L, "gamma once")).toDF("id", "text")
    assert(rep.where(FilterSpec.IntervalsAllOf("text",
      Seq(Seq("gamma"), Seq("gamma")), 0, ordered = false).compile)
      .count() === 1)
    // MIXED-length slots (round-16 verdict #7 — the formerly-rejected
    // domain) evaluate under the minimal-interval algebra (class
    // scaladoc; ProximitySemanticsSpec certifies it against brute
    // force). Where 'scan' is absent the slot serves via "merge join":
    val mixed = Seq(Seq("big vector"), Seq("merge join", "scan"))
    assert(ids(FilterSpec.IntervalsAllOf("text", mixed, 1, ordered = false))
      === Seq(1L, 2L, 3L))
    // ...and the short alternative genuinely serves where it appears
    val ms = Seq((20L, "scan big vector")).toDF("id", "text")
    assert(ms.where(FilterSpec.IntervalsAllOf("text", mixed, 0,
      ordered = false).compile).count() === 1)
    // per-slot OR-minimization (Lucene Intervals.or): every "big vector"
    // occurrence contains a "vector" occurrence, so the slot only ever
    // matches 'vector' — the wide alternative cannot buy gap budget with
    // its inflated width (doc 21 stays OUT at gaps 0; the naive
    // exists-a-choice would have let it in)
    val or = Seq((21L, "merge join big vector"), (22L, "merge join vector"))
      .toDF("id", "text")
    val orSlots = Seq(Seq("vector", "big vector"), Seq("merge join"))
    assert(or.where(FilterSpec.IntervalsAllOf("text", orSlots, 0,
      ordered = false).compile).select("id").as[Long].collect().toSeq
      === Seq(22L))
    // the SAME mixed slot set ordered: unchanged behavior (only doc 1
    // has the slots in order)
    assert(ids(FilterSpec.IntervalsAllOf("text", mixed, 1)) === Seq(1L))
    assert(FilterSpec.IntervalsAllOf("text", slots, 2, ordered = false).render
      === """text:allof[("big vector") ("merge join")]~any2""")
  }

  test("matchBoolPrefix: whole terms in any order, the last term as prefix") {
    val docs = Seq(
      (1L, "vector scan done"),   // whole 'vector' + 'scan' has prefix sc
      (2L, "scan the vector"),    // order-free: sc-word BEFORE vector
      (3L, "vector only"),        // no sc-prefixed token
      (4L, "scanner vector"),     // 'scanner' satisfies the prefix
      (5L, "scan without the v"), // 'vector' missing
    ).toDF("id", "text")
    def ids(spec: FilterSpec): Seq[Long] =
      docs.where(spec.compile).select("id").as[Long].collect().sorted.toSeq
    assert(ids(FilterSpec.matchBoolPrefix("text", "vector sc"))
      === Seq(1L, 2L, 4L))
    // single term degenerates to the bare prefix
    assert(ids(FilterSpec.matchBoolPrefix("text", "sc")) === Seq(1L, 2L, 4L, 5L))
    intercept[IllegalArgumentException](FilterSpec.matchBoolPrefix("text", "..."))
  }

  test("span_first: phrase must END within the position bound") {
    val docs = Seq(
      (1L, "spark at the front"),        // spark ends at 1
      (2L, "a b c d e spark late"),      // spark ends at 6 — boundary in
      (3L, "a b c d e f spark too late"),// ends at 7 — out
      (4L, "big data spark"),            // ends at 3
      (5L, "no match here"),
    ).toDF("id", "text")
    def ids(spec: FilterSpec): Seq[Long] =
      docs.where(spec.compile).select("id").as[Long].collect().sorted.toSeq
    assert(ids(FilterSpec.SpanFirst("text", "spark", end = 6)) === Seq(1L, 2L, 4L))
    // phrase form: both tokens inside the bound
    assert(ids(FilterSpec.SpanFirst("text", "data spark", end = 3)) === Seq(4L))
    assert(ids(FilterSpec.SpanFirst("text", "data spark", end = 2)) === Seq())
    intercept[IllegalArgumentException](FilterSpec.SpanFirst("text", "spark", 0))
    intercept[IllegalArgumentException](
      FilterSpec.SpanFirst("text", "...", 3).compile)
  }

  test("span_not: include occurrence clear of every exclude span") {
    val docs = Seq(
      (1L, "plain scan here"),           // clear scan
      (2L, "vector scan only"),          // scan only inside the phrase
      (3L, "vector scan then scan"),     // second scan is clear
      (4L, "scan vector"),               // clear (phrase not formed)
      (5L, "no match"),
    ).toDF("id", "text")
    def ids(spec: FilterSpec): Seq[Long] =
      docs.where(spec.compile).select("id").as[Long].collect().sorted.toSeq
    assert(ids(FilterSpec.SpanNot("text", "scan", "vector scan"))
      === Seq(1L, 3L, 4L))
    // pre-dilation: doc 3's clear scan sits 2 past the exclude span's
    // end — pre=2 widens the window enough to swallow it
    assert(ids(FilterSpec.SpanNot("text", "scan", "vector scan", pre = 2))
      === Seq(1L, 4L))
    // single-token exclude with pre=1: 'scan' must not IMMEDIATELY follow
    // 'vector' — doc 2's only scan does; doc 3's second scan is clear
    assert(ids(FilterSpec.SpanNot("text", "scan", "vector", pre = 1))
      === Seq(1L, 3L, 4L))
    intercept[IllegalArgumentException](
      FilterSpec.SpanNot("text", "scan", "vector scan", pre = -1))
    intercept[IllegalArgumentException](
      FilterSpec.SpanNot("text", "...", "x").compile)
  }

  test("span_within / span_containing: little inside a span_near window") {
    val docs = Seq(
      (1L, "alpha key beta"),            // key inside [alpha..beta], width 3
      (2L, "alpha beta key"),            // key OUTSIDE the window (after beta)
      (3L, "key alpha beta"),            // key before the window
      (4L, "alpha gap gap key beta"),    // inside, but window needs slop 3
      (5L, "beta key alpha"),            // unordered window only
      (6L, "alpha key"),                 // no beta: big never forms
      (7L, "no match"),
    ).toDF("id", "text")
    def ids(spec: FilterSpec): Seq[Long] =
      docs.where(coalesce(spec.compile, lit(false)))
        .select("id").as[Long].collect().sorted.toSeq
    // conjunction would keep docs 1-5; ordered enclosure keeps only 1
    // at slop 1, unordered adds doc 5's reversed window
    assert(ids(FilterSpec.SpanWithin("text", "key",
      Seq("alpha", "beta"), slop = 1, inOrder = true)) === Seq(1L))
    assert(ids(FilterSpec.SpanWithin("text", "key",
      Seq("alpha", "beta"), slop = 1)) === Seq(1L, 5L))
    // slop 3 admits doc 4's wide window; doc 5 needs the unordered flag
    assert(ids(FilterSpec.SpanWithin("text", "key",
      Seq("alpha", "beta"), slop = 3)) === Seq(1L, 4L, 5L))
    assert(ids(FilterSpec.SpanWithin("text", "key",
      Seq("alpha", "beta"), slop = 3, inOrder = true)) === Seq(1L, 4L))
    // the document-level dual matches identically
    assert(ids(FilterSpec.SpanContaining("text", "key",
      Seq("alpha", "beta"), slop = 3)) === Seq(1L, 4L, 5L))
    // degenerate big (single contiguous phrase) rejects loudly
    intercept[IllegalArgumentException](
      FilterSpec.SpanWithin("text", "key", Seq("alpha beta"), slop = 1))
    intercept[IllegalArgumentException](
      FilterSpec.SpanWithin("text", "key", Seq("alpha", "beta"), slop = -1))
    // render carries the operands and flags
    assert(FilterSpec.SpanWithin("text", "key", Seq("a", "b"), 2).render
      === """text:"key"~within("a","b",slop=2,unordered)""")
    assert(FilterSpec.SpanContaining("text", "key", Seq("a", "b"), 2,
      inOrder = true).render
      === """text:"key"~containing("a","b",slop=2,ordered)""")
  }

  test("intervals predicate sources: prefix, wildcard, fuzzy, range compose under all_of") {
    import FilterSpec.IntervalSource._
    val docs = Seq(
      (1L, "scan the table now"),     // sca* .. ~tabel within 4
      (2L, "table before scan"),      // wrong order
      (3L, "scan far far far far away table"), // window too wide at gaps 3
      (4L, "scab tabel"),             // prefix + exact-fuzzy hit, adjacent
      (5L, "scan only"),
    ).toDF("id", "text")
    def ids(spec: FilterSpec): Seq[Long] =
      docs.where(coalesce(spec.compile, lit(false)))
        .select("id").as[Long].collect().sorted.toSeq
    val ord = FilterSpec.IntervalsPattern("text",
      Seq(Prefix("sca"), Fuzzy("tabel", 1)), maxGaps = 3)
    assert(ids(ord) === Seq(1L, 4L))
    // unordered admits the reversed doc
    assert(ids(FilterSpec.IntervalsPattern("text",
      Seq(Prefix("sca"), Fuzzy("tabel", 1)), maxGaps = 3, ordered = false))
      === Seq(1L, 2L, 4L))
    // wildcard and range sources
    assert(ids(FilterSpec.IntervalsPattern("text",
      Seq(WildcardPat("t?ble"), Term("now")), maxGaps = 0)) === Seq(1L))
    assert(ids(FilterSpec.IntervalsPattern("text",
      Seq(Range("sca", "scb")), maxGaps = 0)) === Seq(1L, 2L, 3L, 4L, 5L))
    // rejects: multi-token term/prefix, bad fuzzy bound, negative gaps
    intercept[IllegalArgumentException](Term("two words"))
    intercept[IllegalArgumentException](Prefix("a b"))
    intercept[IllegalArgumentException](Fuzzy("x", maxEdits = 3))
    intercept[IllegalArgumentException](Range("b", "a"))
    intercept[IllegalArgumentException](
      FilterSpec.IntervalsPattern("text", Seq(Term("a")), maxGaps = -1))
    assert(FilterSpec.IntervalsPattern("text",
      Seq(Prefix("sca"), Fuzzy("tabel", 1), Range("a", "b")), 2).render
      === """text:pat[sca* tabel~1 [a..b]]~gaps2""")
  }

  test("intervals filter rules: all six containment relations") {
    val docs = Seq(
      (1L, "spark quick scan"),          // interval [0,2], no vector
      (2L, "spark vector scan"),         // vector INSIDE the interval
      (3L, "vector spark quick scan"),   // vector outside, interval clear
      (4L, "spark a b c d e f scan"),    // gaps 6 > 5: no source match
      (5L, "scan then spark"),           // wrong order: no source match
      (6L, "spark scan and spark vector scan"), // one clear + one containing
    ).toDF("id", "text")
    def ids(rule: String, flt: String = "vector"): Seq[Long] =
      docs.where(FilterSpec.IntervalsFiltered("text", "spark scan", 5,
        rule, flt).compile).select("id").as[Long].collect().sorted.toSeq
    assert(ids("not_containing") === Seq(1L, 3L, 6L))
    assert(ids("containing") === Seq(2L, 6L))
    assert(ids("overlapping") === Seq(2L, 6L)) // single-token filter: same
    assert(ids("not_overlapping") === Seq(1L, 3L, 6L))
    // contained_by: the source interval inside a filter occurrence — a
    // 3-token filter phrase covering the whole 'spark vector scan' window
    assert(ids("contained_by", "spark vector scan") === Seq(2L, 6L))
    // doc 2's ONLY interval is exactly the filter occurrence → excluded
    assert(ids("not_contained_by", "spark vector scan") === Seq(1L, 3L, 6L))
    intercept[IllegalArgumentException](
      FilterSpec.IntervalsFiltered("text", "spark scan", 5, "inside", "x"))
    intercept[IllegalArgumentException](
      FilterSpec.IntervalsFiltered("text", "spark scan", -1, "containing", "x"))
    intercept[IllegalArgumentException](
      FilterSpec.IntervalsFiltered("text", "spark scan", 5, "containing", "...")
        .compile)
  }

  test("geo_bounding_box: plain box and antimeridian-crossing box") {
    val pts = Seq(
      (1L, 10.0, 0.0),    // inside the plain box
      (2L, 70.0, 0.0),    // north of top
      (3L, 10.0, 100.0),  // east of right (plain box)
      (4L, 10.0, 170.0),  // inside the CROSSING box (east half)
      (5L, 10.0, -150.0), // inside the CROSSING box (west half)
      (6L, 10.0, 0.0),    // outside the crossing box's lon
    ).toDF("id", "lat", "lon")
    def ids(spec: FilterSpec): Seq[Long] =
      pts.where(spec.compile).select("id").as[Long].collect().sorted.toSeq
    // plain: left <= right
    assert(ids(FilterSpec.GeoBoundingBox("lat", "lon", 60, -20, -10, 20))
      === Seq(1L, 6L))
    // crossing: left 150 > right -120 → two half-boxes
    assert(ids(FilterSpec.GeoBoundingBox("lat", "lon", 60, 150, -10, -120))
      === Seq(4L, 5L))
    intercept[IllegalArgumentException](
      FilterSpec.GeoBoundingBox("lat", "lon", top = -10, left = 0, bottom = 10, right = 0))
    intercept[IllegalArgumentException](
      FilterSpec.GeoBoundingBox("lat", "lon", 91, 0, 0, 0))
  }

  test("geo_shape polygon: even-odd ray casting handles concave shapes") {
    // notched square: bottom boundary dips up to the apex (0,-90), so the
    // triangle under the apex is OUTSIDE
    val poly = FilterSpec.GeoPolygon("lat", "lon", Seq(
      (-60.0, -150.0), (60.0, -150.0), (60.0, -30.0), (-60.0, -30.0),
      (0.0, -90.0)))
    val pts = Seq(
      (1L, 30.0, -90.0),    // inside, above the apex
      (2L, -50.0, -90.0),   // in the notch -> outside
      (3L, 0.0, -170.0),    // west of the square
      (4L, 0.0, 0.0),       // east of the square
      (5L, -50.0, -145.0),  // inside the west lobe, below the apex
      (6L, 70.0, -90.0),    // north of the square
    ).toDF("id", "lat", "lon")
    assert(pts.where(poly.compile).select("id").as[Long].collect().sorted.toSeq
      === Seq(1L, 5L))
    intercept[IllegalArgumentException](
      FilterSpec.GeoPolygon("lat", "lon", Seq((0.0, 0.0), (1.0, 1.0))))
    intercept[IllegalArgumentException](
      FilterSpec.GeoPolygon("lat", "lon",
        Seq((0.0, 0.0), (1.0, 1.0), (95.0, 0.0))))
  }

  test("geo_shape multi-ring: holes and multipolygon via one even-odd count; relations") {
    // square with a centered hole, plus a second disjoint square component
    val outer = Seq((-40.0, -160.0), (40.0, -160.0), (40.0, -80.0), (-40.0, -80.0))
    val hole = Seq((-10.0, -130.0), (10.0, -130.0), (10.0, -110.0), (-10.0, -110.0))
    val second = Seq((-20.0, 40.0), (20.0, 40.0), (20.0, 80.0), (-20.0, 80.0))
    val shape = FilterSpec.GeoShape("lat", "lon", Seq(outer, hole, second))
    val pts = Seq(
      (1L, 0.0, -150.0),  // in the outer ring, west of the hole -> inside
      (2L, 0.0, -120.0),  // in the hole -> outside
      (3L, 0.0, 60.0),    // in the second component -> inside
      (4L, 0.0, 0.0),     // between the components -> outside
      (5L, 50.0, -120.0), // north of everything -> outside
    ).toDF("id", "lat", "lon")
    def got(s: FilterSpec) = pts.where(s.compile).select("id").as[Long].collect().sorted.toSeq
    assert(got(shape) === Seq(1L, 3L))
    // within coincides with intersects for point docs
    assert(got(shape.copy(relation = "within")) === Seq(1L, 3L))
    // disjoint is the complement over docs that HAVE the field
    assert(got(shape.copy(relation = "disjoint")) === Seq(2L, 4L, 5L))
    // a null point matches NEITHER side (ES's missing-field rule)
    val withNull = pts.unionByName(Seq((9L, null.asInstanceOf[java.lang.Double], null.asInstanceOf[java.lang.Double]))
      .toDF("id", "lat", "lon"))
    assert(withNull.where(shape.compile).select("id").as[Long].collect().sorted.toSeq === Seq(1L, 3L))
    assert(withNull.where(shape.copy(relation = "disjoint").compile)
      .select("id").as[Long].collect().sorted.toSeq === Seq(2L, 4L, 5L))
    // contains rejects loudly for point documents
    val e = intercept[IllegalArgumentException](
      FilterSpec.GeoShape("lat", "lon", Seq(outer), relation = "contains"))
    assert(e.getMessage.contains("impossible for a point"))
  }

  test("geo_shape envelope: four range comparisons, relations, rejects") {
    val env = FilterSpec.GeoEnvelope("lat", "lon", -10, 10, -20, 20)
    val pts = Seq((1L, 0.0, 0.0), (2L, 0.0, 30.0), (3L, 15.0, 0.0), (4L, 10.0, 20.0))
      .toDF("id", "lat", "lon")
    def got(s: FilterSpec) = pts.where(s.compile).select("id").as[Long].collect().sorted.toSeq
    assert(got(env) === Seq(1L, 4L)) // corners inclusive
    assert(got(env.copy(relation = "disjoint")) === Seq(2L, 3L))
    // missing-field docs match NEITHER side — including the sneaky case
    // where one coordinate is null but the OTHER is already out of range
    // (inside = null AND false = false, so an unguarded !inside matches)
    val withNull = pts.unionByName(Seq(
      (8L, null.asInstanceOf[java.lang.Double], java.lang.Double.valueOf(30.0)),
      (9L, null.asInstanceOf[java.lang.Double], null.asInstanceOf[java.lang.Double]))
      .toDF("id", "lat", "lon"))
    assert(withNull.where(env.compile).select("id").as[Long].collect().sorted.toSeq
      === Seq(1L, 4L))
    assert(withNull.where(env.copy(relation = "disjoint").compile)
      .select("id").as[Long].collect().sorted.toSeq === Seq(2L, 3L))
    intercept[IllegalArgumentException](FilterSpec.GeoEnvelope("lat", "lon", 10, -10, 0, 1))
    intercept[IllegalArgumentException](
      FilterSpec.GeoEnvelope("lat", "lon", -10, 10, -20, 20, relation = "contains"))
  }

  test("geo_distance: radius semantics and the oracle fixture's libm margin") {
    // ~111.2 km per degree at the equator: 1° away is inside 200 km,
    // 2° away is outside
    val pts = Seq((1L, 0.0, 0.0), (2L, 0.0, 1.0), (3L, 0.0, 2.0))
      .toDF("id", "lat", "lon")
    val near = FilterSpec.GeoDistance("lat", "lon", 0.0, 0.0, 200.0)
    assert(pts.where(near.compile).select("id").as[Long].collect().sorted.toSeq
      === Seq(1L, 2L))
    intercept[IllegalArgumentException](
      FilterSpec.GeoDistance("lat", "lon", 0, 0, 0.0))
    // The q_geo_distance_filter oracle compares library-rounded trig to a
    // threshold — binary-stable ONLY with corpus margin. Assert the sf0.01
    // fixture keeps every point ≥ 1 km away from the 3000 km edge
    // (measured 2.35 km; ≥12 orders above ≤1-ulp drift).
    val custPath = "/root/testdata/sf0.01/customer.parquet"
    if (new java.io.File(custPath).exists) {
      val km = Aggs.haversineKm(col("lat"), col("lon"), 10.0, 20.0)
      val minMargin = spark.read.parquet(custPath)
        .withColumn("lat", pmod(col("c_acctbal"), lit(180)) - 90 + lit(0.001))
        .withColumn("lon", pmod(col("c_custkey"), lit(360)) - 180 + lit(0.001))
        .select(min(abs(km - lit(3000.0))).as("m")).as[Double].collect().head
      assert(minMargin > 1.0,
        s"geo fixture margin collapsed to $minMargin km — re-pick the radius")
    }
  }
}
