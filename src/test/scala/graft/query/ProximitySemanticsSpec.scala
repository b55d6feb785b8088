package graft.query

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Adversarial semantic verification of the proximity family: the
  * compiled HOF position algebra (SpanNear ordered/unordered,
  * IntervalsAllOf ordered/unordered) evaluated by Spark on hundreds of
  * seeded random documents, compared doc-for-doc against INDEPENDENT
  * brute-force reference evaluators written directly from the Lucene
  * semantics (recursive enumeration over position lists — no shared
  * code with the Column implementation). A disagreement prints the
  * offending document. One Spark job evaluates every predicate for the
  * whole corpus at once.
  */
class ProximitySemanticsSpec extends SparkSpecBase {
  import spark.implicits._

  // -- seeded random corpus over a tiny vocabulary: high collision rates
  //    exercise repeated terms, adjacency, and absence --
  private val vocab = Vector("a", "b", "c", "d")
  private lazy val corpus: Seq[(Long, String)] = {
    val rnd = new scala.util.Random(20260815L)
    (0L until 400L).map { i =>
      val n = rnd.nextInt(13) // 0..12 tokens
      (i, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
  }
  private def toks(text: String): Vector[String] =
    text.split(" ").filter(_.nonEmpty).toVector
  private def positionsOf(ts: Vector[String], t: String): Seq[Int] =
    ts.indices.filter(ts(_) == t)
  private def phraseStarts(ts: Vector[String], p: Seq[String]): Seq[Int] =
    (0 to ts.length - p.length).filter(s => ts.slice(s, s + p.length) == p)

  // -- reference evaluators: direct recursive enumeration --

  /** Lucene span_near: ordered = strictly increasing picks with the
    * pooled displacement bound; unordered = pairwise-distinct picks, one
    * per term, window width − n ≤ slop.
    */
  private def refSpanNear(ts: Vector[String], terms: Seq[String], slop: Int,
      inOrder: Boolean): Boolean =
    if (inOrder) {
      def chain(rest: Seq[String], prev: Int, first: Int): Boolean = rest match {
        case Seq() => true
        case t +: tail => positionsOf(ts, t).exists(p =>
          p > prev &&
            (tail.nonEmpty || p - first - (terms.size - 1) <= slop) &&
            chain(tail, p, first))
      }
      positionsOf(ts, terms.head).exists(p1 => chain(terms.tail, p1, p1))
    } else {
      def chain(rest: Seq[String], chosen: Seq[Int]): Boolean = rest match {
        case Seq() => chosen.max - chosen.min - (terms.size - 1) <= slop
        case t +: tail => positionsOf(ts, t).exists(p =>
          !chosen.contains(p) && chain(tail, chosen :+ p))
      }
      chain(terms, Nil)
    }

  /** intervals all_of: one occurrence (alt, start) per slot; ordered =
    * strictly after the previous slot's end with the enclosing-window
    * gap budget; unordered = any arrangement (overlaps allowed), minimal
    * enclosing window − Σ widths ≤ maxGaps.
    */
  private def refAllOf(ts: Vector[String], slots: Seq[Seq[Seq[String]]],
      maxGaps: Int, ordered: Boolean): Boolean = {
    val occ: Seq[Seq[(Int, Int)]] = slots.map(_.flatMap(alt =>
      phraseStarts(ts, alt.toVector).map(s => (s, s + alt.length - 1))))
    if (ordered) {
      def chain(rest: Seq[Seq[(Int, Int)]], prevEnd: Int, first: Int,
          widthSum: Int): Boolean = rest match {
        case Seq() => true
        case slot +: tail => slot.exists { case (s, e) =>
          s > prevEnd && {
            val w = widthSum + (e - s + 1)
            if (tail.isEmpty) (e + 1 - first) - w <= maxGaps
            else chain(tail, e, first, w)
          }
        }
      }
      if (occ.size == 1) occ.head.nonEmpty
      else occ.head.exists { case (s, e) =>
        chain(occ.tail, e, s, e - s + 1)
      }
    } else {
      def chain(rest: Seq[Seq[(Int, Int)]], minS: Int, maxE: Int,
          widthSum: Int): Boolean = rest match {
        case Seq() => (maxE - minS + 1) - widthSum <= maxGaps
        case slot +: tail => slot.exists { case (s, e) =>
          chain(tail, math.min(minS, s), math.max(maxE, e),
            widthSum + (e - s + 1))
        }
      }
      if (occ.size == 1) occ.head.nonEmpty
      else occ.head.exists { case (s, e) =>
        chain(occ.tail, s, e, e - s + 1)
      }
    }
  }

  /** intervals all_of unordered, the FULL minimal-interval algebra
    * (IntervalsAllOf scaladoc steps 1-4, mixed-length slots legal):
    * per-slot OR-minimization, cross-product candidate windows, combine
    * minimality, then the gap bound — written as independent imperative
    * enumeration, no shared code with the Column pipeline.
    */
  private def refAllOfUnorderedMinimal(ts: Vector[String],
      slots: Seq[Seq[Seq[String]]], maxGaps: Int): Boolean = {
    val raw: Seq[Seq[(Int, Int)]] = slots.map(_.flatMap(alt =>
      phraseStarts(ts, alt.toVector).map(s => (s, s + alt.length - 1))))
    def properlyInside(y: (Int, Int), x: (Int, Int)): Boolean =
      y._1 >= x._1 && y._2 <= x._2 && (y._1 > x._1 || y._2 < x._2)
    val minimized = raw.map(l => l.filter(x => !l.exists(y => properlyInside(y, x))))
    if (minimized.exists(_.isEmpty)) false
    else {
      val cands = minimized.tail.foldLeft(
        minimized.head.map { case (s, e) => (s, e, e - s + 1) }) { (acc, slot) =>
        for (c <- acc; (s, e) <- slot)
          yield (math.min(c._1, s), math.max(c._2, e), c._3 + (e - s + 1))
      }
      def winInside(d: (Int, Int, Int), c: (Int, Int, Int)): Boolean =
        d._1 >= c._1 && d._2 <= c._2 && (d._1 > c._1 || d._2 < c._2)
      cands.exists(c => (c._2 - c._1 + 1) - c._3 <= maxGaps &&
        !cands.exists(d => winInside(d, c)))
    }
  }

  private def compare(name: String, spec: FilterSpec,
      ref: Vector[String] => Boolean): Unit = {
    val got = corpus.toDF("id", "text")
      .select(col("id"), coalesce(spec.compile, lit(false)).as("m"))
      .as[(Long, Boolean)].collect().toMap
    val bad = corpus.filter { case (i, text) => got(i) != ref(toks(text)) }
    if (bad.nonEmpty) fail(
      s"$name: engine disagrees with the reference evaluator on " +
        s"${bad.size} docs, first: <${bad.head._2}> " +
        s"(engine=${got(bad.head._1)})")
  }

  /** span_first: some occurrence of the phrase ENDS at position ≤ end. */
  private def refSpanFirst(ts: Vector[String], phrase: Seq[String],
      end: Int): Boolean =
    phraseStarts(ts, phrase.toVector).exists(s => s + phrase.length <= end)

  /** span_not: some include occurrence clear of every (pre/post-dilated)
    * exclude occurrence.
    */
  private def refSpanNot(ts: Vector[String], inc: Seq[String],
      exc: Seq[String], pre: Int, post: Int): Boolean =
    phraseStarts(ts, inc.toVector).exists { s =>
      val incEnd = s + inc.length - 1
      phraseStarts(ts, exc.toVector).forall(t =>
        t + exc.length - 1 < s - pre || t > incEnd + post)
    }

  /** intervals filter: some ordered source interval (strictly increasing
    * per-term picks, pooled gap ≤ maxGaps) standing in `rule` relation
    * to the filter phrase's occurrences.
    */
  private def refFiltered(ts: Vector[String], src: Seq[String], maxGaps: Int,
      rule: String, flt: Seq[String]): Boolean = {
    val f = phraseStarts(ts, flt.toVector)
    val lf = flt.length
    def ruleCond(s: Int, e: Int): Boolean = rule match {
      case "containing" => f.exists(t => t >= s && t + lf - 1 <= e)
      case "not_containing" => !f.exists(t => t >= s && t + lf - 1 <= e)
      case "overlapping" => f.exists(t => t <= e && t + lf - 1 >= s)
      case "not_overlapping" => f.forall(t => t > e || t + lf - 1 < s)
      case "contained_by" => f.exists(t => t <= s && e <= t + lf - 1)
      case "not_contained_by" => !f.exists(t => t <= s && e <= t + lf - 1)
    }
    def chain(rest: Seq[String], prev: Int, first: Int): Boolean = rest match {
      case Seq() => ruleCond(first, first) // single-term source
      case t +: tail => positionsOf(ts, t).exists(p =>
        p > prev && (
          if (tail.isEmpty)
            p - first - (src.size - 1) <= maxGaps && ruleCond(first, p)
          else chain(tail, p, first)))
    }
    positionsOf(ts, src.head).exists(p1 =>
      if (src.size == 1) ruleCond(p1, p1) else chain(src.tail, p1, p1))
  }

  test("SpanFirst / SpanNot agree with brute-force enumeration on 400 random docs") {
    for (end <- Seq(1, 3, 6)) compare(s"span_first(a b, $end)",
      FilterSpec.SpanFirst("text", "a b", end),
      ts => refSpanFirst(ts, Seq("a", "b"), end))
    for ((pre, post) <- Seq((0, 0), (1, 0), (0, 2))) {
      compare(s"span_not(b, a b, $pre, $post)",
        FilterSpec.SpanNot("text", "b", "a b", pre, post),
        ts => refSpanNot(ts, Seq("b"), Seq("a", "b"), pre, post))
      compare(s"span_not(c d, d, $pre, $post)",
        FilterSpec.SpanNot("text", "c d", "d", pre, post),
        ts => refSpanNot(ts, Seq("c", "d"), Seq("d"), pre, post))
    }
  }

  test("IntervalsFiltered agrees with brute-force enumeration across all six rules") {
    for (rule <- Seq("containing", "not_containing", "overlapping",
        "not_overlapping", "contained_by", "not_contained_by")) {
      compare(s"filtered(a..b, $rule c)",
        FilterSpec.IntervalsFiltered("text", "a b", 3, rule, "c"),
        ts => refFiltered(ts, Seq("a", "b"), 3, rule, Seq("c")))
      compare(s"filtered(a, $rule 'a b')",
        FilterSpec.IntervalsFiltered("text", "a", 0, rule, "a b"),
        ts => refFiltered(ts, Seq("a"), 0, rule, Seq("a", "b")))
    }
  }

  test("SpanNear ordered/unordered agree with brute-force enumeration on 400 random docs") {
    for (slop <- Seq(0, 1, 3); inOrder <- Seq(true, false)) {
      compare(s"span_near(a b, $slop, $inOrder)",
        FilterSpec.SpanNear("text", Seq("a", "b"), slop, inOrder),
        ts => refSpanNear(ts, Seq("a", "b"), slop, inOrder))
      compare(s"span_near(a b c, $slop, $inOrder)",
        FilterSpec.SpanNear("text", Seq("a", "b", "c"), slop, inOrder),
        ts => refSpanNear(ts, Seq("a", "b", "c"), slop, inOrder))
      // repeated term: the distinctness rule is where implementations rot
      compare(s"span_near(a a, $slop, $inOrder)",
        FilterSpec.SpanNear("text", Seq("a", "a"), slop, inOrder),
        ts => refSpanNear(ts, Seq("a", "a"), slop, inOrder))
    }
  }

  test("IntervalsAllOf ordered/unordered agree with brute-force enumeration on 400 random docs") {
    // uniform-width slots so both flags are legal; phrases + alternatives
    val slots: Seq[Seq[Seq[String]]] = Seq(
      Seq(Seq("a", "b"), Seq("c", "d")), // 2-token alternatives
      Seq(Seq("c")))                     // single term
    val specSlots = Seq(Seq("a b", "c d"), Seq("c"))
    for (g <- Seq(0, 1, 4); ordered <- Seq(true, false)) {
      compare(s"all_of(g=$g, ordered=$ordered)",
        FilterSpec.IntervalsAllOf("text", specSlots, g, ordered),
        ts => refAllOf(ts, slots, g, ordered))
    }
    // same-term twin slots, unordered: the overlap-allowed rule
    for (g <- Seq(0, 2)) {
      compare(s"all_of(b,b g=$g unordered)",
        FilterSpec.IntervalsAllOf("text", Seq(Seq("b"), Seq("b")), g,
          ordered = false),
        ts => refAllOf(ts, Seq(Seq(Seq("b")), Seq(Seq("b"))), g,
          ordered = false))
    }
  }

  test("unordered all_of: minimal-interval algebra ≡ exists-a-choice on uniform-width slots") {
    // the IntervalsAllOf scaladoc's equivalence proof, checked
    // empirically over the whole random corpus: on slots whose
    // alternatives share one length, adding per-slot OR-minimization and
    // combine minimality never changes the existential answer — the
    // previously-certified uniform fixtures stay certified under the new
    // unified evaluation
    val uniform: Seq[Seq[Seq[Seq[String]]]] = Seq(
      Seq(Seq(Seq("a", "b"), Seq("c", "d")), Seq(Seq("c"))),
      Seq(Seq(Seq("b")), Seq(Seq("b"))),
      Seq(Seq(Seq("a")), Seq(Seq("b")), Seq(Seq("c"))))
    for (slots <- uniform; g <- Seq(0, 1, 4); (_, text) <- corpus) {
      val ts = toks(text)
      assert(refAllOf(ts, slots, g, ordered = false) ===
        refAllOfUnorderedMinimal(ts, slots, g),
        s"uniform equivalence broke on <$text> g=$g slots=$slots")
    }
  }

  test("IntervalsAllOf unordered MIXED-length slots agree with the minimal-interval brute force") {
    val configs: Seq[(Seq[Seq[String]], Seq[Seq[Seq[String]]])] = Seq(
      // one alternative strictly contains the other ("b c" ⊃ "c"): the
      // OR-minimization rule — the slot only ever matches the short form
      (Seq(Seq("c", "b c"), Seq("a")),
        Seq(Seq(Seq("c"), Seq("b", "c")), Seq(Seq("a")))),
      // mixed widths with NO containment: Σ widths varies by choice —
      // the combine-minimality step carries the semantics
      (Seq(Seq("a b", "c"), Seq("d")),
        Seq(Seq(Seq("a", "b"), Seq("c")), Seq(Seq("d")))),
      // containment the other way round plus a same-token second slot
      (Seq(Seq("a", "a b"), Seq("b")),
        Seq(Seq(Seq("a"), Seq("a", "b")), Seq(Seq("b")))),
      // three slots, two of them mixed
      (Seq(Seq("a b", "c"), Seq("b"), Seq("d", "c d")),
        Seq(Seq(Seq("a", "b"), Seq("c")), Seq(Seq("b")),
          Seq(Seq("d"), Seq("c", "d")))))
    for ((specSlots, slots) <- configs; g <- Seq(0, 1, 3)) {
      compare(s"all_of_mixed($specSlots, g=$g)",
        FilterSpec.IntervalsAllOf("text", specSlots, g, ordered = false),
        ts => refAllOfUnorderedMinimal(ts, slots, g))
    }
    // the rejected-domain sanity check: naive exists-a-choice genuinely
    // DIVERGES from the minimal algebra somewhere on this corpus (it
    // over-matches via a wide alternative's inflated Σ widths) — proving
    // these configs exercise the semantics the round-16 reject pinned
    val divergent = corpus.exists { case (_, text) =>
      val ts = toks(text)
      refAllOf(ts, Seq(Seq(Seq("c"), Seq("b", "c")), Seq(Seq("a"))), 0,
        ordered = false) !=
        refAllOfUnorderedMinimal(ts,
          Seq(Seq(Seq("c"), Seq("b", "c")), Seq(Seq("a"))), 0)
    }
    assert(divergent, "mixed-length configs never separated the naive " +
      "and minimal semantics on this corpus — the certification has no teeth")
  }

  /** span_within / span_containing: some choice of one occurrence per big
    * clause satisfying the span_near arrangement rule (ordered: strictly
    * sequential; unordered: pairwise-distinct starts) whose window
    * [min start, max end] passes the slop bound AND encloses some little
    * occurrence — written straight from the enclosurePredicate scaladoc,
    * recursive enumeration over position lists.
    */
  private def refEnclosure(ts: Vector[String], little: Seq[String],
      big: Seq[Seq[String]], slop: Int, inOrder: Boolean): Boolean = {
    val l = phraseStarts(ts, little.toVector)
    val widthSum = big.map(_.length).sum
    def close(ws: Int, we: Int): Boolean =
      (we - ws + 1) - widthSum <= slop &&
        l.exists(s => s >= ws && s + little.length - 1 <= we)
    if (inOrder) {
      def chain(rest: Seq[Seq[String]], prevEnd: Int, first: Int): Boolean =
        rest match {
          case Seq() => close(first, prevEnd)
          case p +: tail => phraseStarts(ts, p.toVector).exists(s =>
            s > prevEnd && chain(tail, s + p.length - 1, first))
        }
      phraseStarts(ts, big.head.toVector).exists(s =>
        chain(big.tail, s + big.head.length - 1, s))
    } else {
      def chain(rest: Seq[Seq[String]], picked: Seq[(Int, Int)]): Boolean =
        rest match {
          case Seq() => close(picked.map(_._1).min, picked.map(_._2).max)
          case p +: tail => phraseStarts(ts, p.toVector).exists(s =>
            !picked.exists(_._1 == s) &&
              chain(tail, picked :+ ((s, s + p.length - 1))))
        }
      chain(big, Nil)
    }
  }

  // -- predicate-source intervals need a vocabulary where prefix /
  //    wildcard / fuzzy / range distinguish tokens --
  private val vocab2 = Vector("aa", "ab", "abc", "ba", "bb", "ca")
  private lazy val corpus2: Seq[(Long, String)] = {
    val rnd = new scala.util.Random(20260816L)
    (0L until 400L).map { i =>
      val n = rnd.nextInt(11) // 0..10 tokens
      (i, Seq.fill(n)(vocab2(rnd.nextInt(vocab2.size))).mkString(" "))
    }
  }
  private def compare2(name: String, spec: FilterSpec,
      ref: Vector[String] => Boolean): Unit = {
    val got = corpus2.toDF("id", "text")
      .select(col("id"), coalesce(spec.compile, lit(false)).as("m"))
      .as[(Long, Boolean)].collect().toMap
    val bad = corpus2.filter { case (i, text) => got(i) != ref(toks(text)) }
    if (bad.nonEmpty) fail(
      s"$name: engine disagrees with the reference evaluator on " +
        s"${bad.size} docs, first: <${bad.head._2}> " +
        s"(engine=${got(bad.head._1)})")
  }

  /** Independent edit-distance-at-most-one predicate: equality, one
    * substitution, one adjacent transposition, or one insert/delete —
    * written case-by-case, no DP shared with the engine's expression.
    */
  private def within1Edit(a: String, b: String): Boolean = {
    def oneSub = a.length == b.length &&
      a.indices.count(i => a(i) != b(i)) == 1
    def oneSwap = a.length == b.length && {
      val d = a.indices.filter(i => a(i) != b(i))
      d.length == 2 && d(1) == d(0) + 1 &&
        a(d(0)) == b(d(1)) && a(d(1)) == b(d(0))
    }
    def oneIndel = {
      val (s, l) = if (a.length < b.length) (a, b) else (b, a)
      l.length == s.length + 1 &&
        (0 to s.length).exists(i => l.take(i) + l.drop(i + 1) == s)
    }
    a == b || oneSub || oneSwap || oneIndel
  }

  /** intervals all_of over width-1 predicate sources: one position per
    * slot; ordered = strictly increasing; unordered = any (repeats
    * allowed); window − #slots ≤ maxGaps.
    */
  private def refPattern(ts: Vector[String], preds: Seq[String => Boolean],
      maxGaps: Int, ordered: Boolean): Boolean = {
    val pos: Seq[Seq[Int]] = preds.map(p => ts.indices.filter(i => p(ts(i))))
    val k = preds.size
    if (k == 1) pos.head.nonEmpty
    else if (ordered) {
      def go(i: Int, prev: Int, first: Int): Boolean =
        if (i == k) (prev - first + 1) - k <= maxGaps
        else pos(i).exists(s => s > prev && go(i + 1, s, first))
      pos.head.exists(s => go(1, s, s))
    } else {
      def go(i: Int, picked: Seq[Int]): Boolean =
        if (i == k) (picked.max - picked.min + 1) - k <= maxGaps
        else pos(i).exists(s => go(i + 1, picked :+ s))
      go(0, Nil)
    }
  }

  test("IntervalsPattern predicate sources agree with brute-force enumeration on 400 random docs") {
    import FilterSpec.IntervalSource._
    val wc = "(?s)^.b$".r // token-level ?b wildcard as an anchored regex
    for (g <- Seq(0, 1, 3); ord <- Seq(true, false)) {
      compare2(s"pat(a*, ba; g=$g, ord=$ord)",
        FilterSpec.IntervalsPattern("text",
          Seq(Prefix("a"), Term("ba")), g, ord),
        ts => refPattern(ts,
          Seq(_.startsWith("a"), _ == "ba"), g, ord))
      compare2(s"pat([aa..ba], ab~1; g=$g, ord=$ord)",
        FilterSpec.IntervalsPattern("text",
          Seq(Range("aa", "ba"), Fuzzy("ab", 1)), g, ord),
        ts => refPattern(ts,
          Seq(t => t >= "aa" && t <= "ba", within1Edit(_, "ab")), g, ord))
      compare2(s"pat(?b, a*, ca; g=$g, ord=$ord)",
        FilterSpec.IntervalsPattern("text",
          Seq(WildcardPat("?b"), Prefix("a"), Term("ca")), g, ord),
        ts => refPattern(ts,
          Seq(t => wc.matches(t), _.startsWith("a"), _ == "ca"), g, ord))
    }
    // single predicate slot degenerates to existence
    compare2("pat(abc~1)",
      FilterSpec.IntervalsPattern("text", Seq(Fuzzy("abc", 1)), 0),
      ts => ts.exists(within1Edit(_, "abc")))
  }

  test("SpanWithin / SpanContaining agree with brute-force enumeration on 400 random docs") {
    for (slop <- Seq(0, 1, 3); ord <- Seq(true, false)) {
      compare(s"span_within(b, [a,c], $slop, ord=$ord)",
        FilterSpec.SpanWithin("text", "b", Seq("a", "c"), slop, ord),
        ts => refEnclosure(ts, Seq("b"), Seq(Seq("a"), Seq("c")), slop, ord))
      // multi-token little
      compare(s"span_containing(c d, [a,b], $slop, ord=$ord)",
        FilterSpec.SpanContaining("text", "c d", Seq("a", "b"), slop, ord),
        ts => refEnclosure(ts, Seq("c", "d"), Seq(Seq("a"), Seq("b")), slop, ord))
      // three clauses
      compare(s"span_within(a, [b,c,d], $slop, ord=$ord)",
        FilterSpec.SpanWithin("text", "a", Seq("b", "c", "d"), slop, ord),
        ts => refEnclosure(ts, Seq("a"),
          Seq(Seq("b"), Seq("c"), Seq("d")), slop, ord))
      // a PHRASE clause on the big side
      compare(s"span_within(b, [a b, c], $slop, ord=$ord)",
        FilterSpec.SpanWithin("text", "b", Seq("a b", "c"), slop, ord),
        ts => refEnclosure(ts, Seq("b"), Seq(Seq("a", "b"), Seq("c")), slop, ord))
      // repeated clause terms: the pairwise-distinct rule does real work
      compare(s"span_within(a, [a,a], $slop, ord=$ord)",
        FilterSpec.SpanWithin("text", "a", Seq("a", "a"), slop, ord),
        ts => refEnclosure(ts, Seq("a"), Seq(Seq("a"), Seq("a")), slop, ord))
    }
  }
}
