package graft

import graft.expr.{GeohashAlgo, TextShingleAlgo}
import graft.schema.VarType
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests (SURVEY.md §5): driver-side invariants that don't need a
  * SparkSession — name sanitization idempotence, vartype round-trips,
  * geohash containment, tokenizer/regex agreement. Raw ScalaCheck (the
  * scalatest bridge artifact isn't in the offline cache).
  */
class PropertySpec extends AnyFunSuite {

  private def check(name: String)(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, s"$name: ${res.status}")
  }

  private val nameGen: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(' ', ',', ';', '{', '}', '(', ')', '=', '/', '_')))
      .map(_.mkString)

  test("column-name sanitization is idempotent") {
    val invalid = "[ ,;{}()\n\t=/&#]"
    check("sanitize")(Prop.forAll(nameGen) { name =>
      val once = name.replaceAll(invalid, "").toLowerCase
      once.replaceAll(invalid, "").toLowerCase == once
    })
  }

  test("VarType serialize/parse round-trips") {
    val vt: Gen[VarType] = Gen.oneOf(
      Gen.const(VarType.Identifier), Gen.const(VarType.DateTime),
      Gen.const(VarType.Bool), Gen.const(VarType.Text), Gen.const(VarType.Unknown),
      for {
        lo <- Gen.chooseNum(-1000, 1000); hi <- Gen.chooseNum(-1000, 1000)
        step <- Gen.oneOf(1.0, 0.1, 10.0)
      } yield VarType.Range(lo.toDouble, hi.toDouble, step),
      Gen.nonEmptyListOf(Gen.identifier.suchThat(_.nonEmpty)).map(VarType.Enum(_)),
    )
    check("vartype")(Prop.forAll(vt) { t => VarType.parse(t.serialize) == t })
  }

  test("geohash encode/decode containment at any precision") {
    check("geohash-contain")(Prop.forAll(
      Gen.chooseNum(-89.999, 89.999), Gen.chooseNum(-179.999, 179.999),
      Gen.chooseNum(1, 8)) { (lat, lon, p) =>
      val h = GeohashAlgo.encode(lat, lon, p)
      val (latLo, latHi, lonLo, lonHi) = GeohashAlgo.decodeBounds(h)
      h.length == p && latLo <= lat && lat <= latHi && lonLo <= lon && lon <= lonHi
    })
  }

  test("geohash prefixes nest: the precision-4 cell refines the precision-3 cell") {
    check("geohash-nest")(Prop.forAll(
      Gen.chooseNum(-89.0, 89.0), Gen.chooseNum(-179.0, 179.0)) { (lat, lon) =>
      GeohashAlgo.encode(lat, lon, 3) == GeohashAlgo.encode(lat, lon, 4).take(3)
    })
  }

  test("native tokenizer agrees with the regex definition on arbitrary strings") {
    check("tokenize")(Prop.forAll(Gen.asciiStr, Gen.alphaNumStr) { (a, b) =>
      val s = a + " " + b
      val expected = s.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
      TextShingleAlgo.tokenize(UTF8String.fromString(s)).toSeq == expected
    })
  }

  test("unicode analyzer: tokens are space-free, lowercase, and re-analyze to themselves") {
    // mixed Latin / digit / punctuation / apostrophe / CJK streams; the
    // re-analyze fixpoint is what makes the padded-instr matching
    // construction sound (a stored token stream analyzed again must not
    // change)
    val mixedTextGen: Gen[String] =
      Gen.listOf(Gen.oneOf(
        Gen.alphaNumChar,
        Gen.oneOf(' ', '.', ',', '\'', '’', '-', '!', '_'),
        Gen.oneOf('漢', '字', '引', '擎', 'こ', 'れ', 'テ', 'ス', 'ト',
          '안', '녕', 'é', 'Ü', 'ß'))).map(_.mkString)
    check("unicode-analyze")(Prop.forAll(mixedTextGen) { s =>
      val toks = graft.expr.TextMatch.analyzeUnicode(s)
      toks.forall(t => t.nonEmpty && !t.contains(" ") &&
        t == t.toLowerCase(java.util.Locale.ROOT)) &&
        graft.expr.TextMatch.analyzeUnicode(toks.mkString(" ")) == toks
    })
  }

  test("sorted-merge jaccard equals the set definition") {
    check("jaccard")(Prop.forAll(
      Gen.listOf(Gen.chooseNum(0L, 40L)), Gen.listOf(Gen.chooseNum(0L, 40L))) { (a, b) =>
      val sa = a.distinct.sorted
      val sb = b.distinct.sorted
      val expected =
        if (sa.isEmpty && sb.isEmpty) 0.0
        else sa.toSet.intersect(sb.toSet).size.toDouble / sa.toSet.union(sb.toSet).size
      val got = TextShingleAlgo.jaccardSorted(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(sa.toArray),
        new org.apache.spark.sql.catalyst.util.GenericArrayData(sb.toArray))
      math.abs(got - expected) < 1e-12
    })
  }

  test("FilterSpec render never throws and is non-empty") {
    check("render")(Prop.forAll(
      nameGen.suchThat(_.nonEmpty), Gen.chooseNum(-100.0, 100.0), Gen.chooseNum(-100.0, 100.0)) {
      (f, lo, hi) => graft.query.FilterSpec.NumericRange(f, lo, hi).render.nonEmpty
    })
  }

  // Small-vocabulary token arrays force heavy gram repetition — the regime
  // the repetition kernel exists for.
  private val tokensGen: Gen[List[String]] =
    Gen.listOf(Gen.oneOf("a", "b", "c", "ab", "xyz"))

  test("GramStats agrees with a naive reference on random token arrays") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    check("gram-stats")(Prop.forAll(tokensGen, Gen.chooseNum(1, 4)) { (toks, n) =>
      val grams = if (toks.length < n) Seq.empty
        else toks.sliding(n).map(_.mkString(" ")).toSeq
      val byGram = grams.groupBy(identity).view.mapValues(_.size.toLong).toMap
      def chars(g: String) = (g.length - (n - 1)).toLong
      val expTotal = grams.size.toLong
      val expTotalChars = grams.map(chars).sum
      val expDupOcc = byGram.collect { case (_, c) if c > 1 => c }.sum
      val expDupChars = byGram.collect { case (g, c) if c > 1 => c * chars(g) }.sum
      val (expTopCount, expTopChars) =
        if (byGram.isEmpty) (0L, 0L)
        else {
          val maxC = byGram.values.max
          val atMax = byGram.filter(_._2 == maxC)
          val maxChars = atMax.keys.map(chars).max
          val pick = atMax.keys.filter(g => chars(g) == maxChars).min
          (byGram(pick), chars(pick))
        }
      val got = graft.expr.GramStatsAlgo.compute(
        new GenericArrayData(toks.map(t => UTF8String.fromString(t): AnyRef).toArray), n)
      got.getLong(0) == expTotal && got.getLong(1) == expTotalChars &&
        got.getLong(2) == expDupOcc && got.getLong(3) == expDupChars &&
        got.getLong(4) == expTopCount && got.getLong(5) == expTopChars
    })
  }

  test("geotile zoom-out identity: finer floor >> k equals coarser floor, clamp included") {
    // The PreAgg.geoTileGridAt serving identity, checked on the exact
    // double trees Aggs.geoTileXY emits (power-of-two scaling is a bare
    // exponent shift, so the two roundings are the same rounding; the
    // edge clamp commutes because (2^zi−1) >> k = 2^z−1).
    def tile(u: Double, z: Int): Long = {
      val t = 1L << z
      math.min(t - 1L, math.max(0L, math.floor(u * t).toLong))
    }
    check("geotile-zoom")(Prop.forAll(
      Gen.chooseNum(-90.0, 90.0), Gen.chooseNum(-180.0, 180.0),
      Gen.chooseNum(0, 18), Gen.chooseNum(0, 18)) { (lat, lon, a, b) =>
      val z = math.min(a, b)
      val zi = math.max(a, b)
      val ux = (lon + 180.0) / 360.0
      val latRad = lat * (math.Pi / 180.0)
      val uy = (1.0 - math.log(math.tan(latRad) + 1.0 / math.cos(latRad)) / math.Pi) / 2.0
      (tile(ux, zi) >> (zi - z)) == tile(ux, z) &&
        (tile(uy, zi) >> (zi - z)) == tile(uy, z)
    })
  }

  test("winnowing selects a subset of gram hashes at guaranteed coverage") {
    val textGen = Gen.listOf(Gen.oneOf("a", "b", "c", "d")).map(_.mkString(" "))
    check("winnow")(Prop.forAll(textGen, Gen.chooseNum(1, 3), Gen.chooseNum(1, 4)) { (text, k, w) =>
      val toks = TextShingleAlgo.tokenize(UTF8String.fromString(text))
      val fps = graft.expr.WinnowAlgo.fingerprints(UTF8String.fromString(text), k, w)
      val got = (0 until fps.numElements()).map(fps.getLong).toSeq
      if (toks.length < k) got.isEmpty
      else {
        val grams = toks.sliding(k).map(_.mkString(" ")).toSeq
        val hashes = grams.map(graft.expr.WinnowAlgo.portableHash)
        val windows = if (hashes.length < w) Seq(hashes) else hashes.sliding(w).toSeq
        val expected = windows.map(_.min).distinct.sorted
        got == expected
      }
    })
  }

  test("query_string render/parse round-trips over generated predicate trees") {
    import graft.query.{FilterSpec, QueryString}
    val word: Gen[String] = for {
      n <- Gen.chooseNum(1, 6)
      cs <- Gen.listOfN(n, Gen.oneOf(('a' to 'z') ++ ('0' to '9')))
    } yield cs.mkString
    // terms that NEED `\`-escaping: reserved characters (operators,
    // wildcards, separators, quotes, whitespace) mixed into plain words —
    // render must escape them, parse must return the literal term
    // (round-13 verdict #6's escape round-trip).
    val hardWord: Gen[String] = for {
      n <- Gen.chooseNum(1, 6)
      cs <- Gen.listOfN(n, Gen.oneOf(Gen.oneOf(('a' to 'z') ++ ('0' to '9')),
        Gen.oneOf("+-!(){}[]^\"~*?:\\/ ".toSeq)))
    } yield cs.mkString
    val field: Gen[String] = Gen.oneOf("text", "lang", "source", "n")
    val leaf: Gen[FilterSpec] = Gen.oneOf(
      for { f <- field; t <- word } yield FilterSpec.TermMatch(f, t),
      for { f <- field; t <- hardWord } yield FilterSpec.TermMatch(f, t),
      for { f <- field; t <- word } yield FilterSpec.AnalyzedPrefix(f, t),
      for { f <- field; t <- hardWord } yield FilterSpec.AnalyzedPrefix(f, t),
      for { f <- field; t <- hardWord; e <- Gen.chooseNum(0, 2) }
        yield FilterSpec.FuzzyTerm(f, t, e),
      for { f <- field; a <- word; b <- word } yield FilterSpec.Phrase(f, s"$a $b"),
      for { f <- field; a <- word; b <- word; s <- Gen.chooseNum(0, 3) }
        yield FilterSpec.PhraseSlop(f, s"$a $b", s),
      // the span/intervals proximity suffixes (~span/~near/~gaps/~any)
      for { f <- field; a <- word; b <- word; s <- Gen.chooseNum(0, 3)
            o <- Gen.oneOf(true, false) }
        yield FilterSpec.SpanNear(f, Seq(a, b), s, inOrder = o),
      for { f <- field; a <- word; b <- word; s <- Gen.chooseNum(0, 3)
            o <- Gen.oneOf(true, false) }
        yield FilterSpec.IntervalsMatch(f, s"$a $b", s, ordered = o),
      for { f <- field; t <- word; e <- Gen.chooseNum(0, 2) }
        yield FilterSpec.FuzzyTerm(f, t, e),
      for { f <- field; a <- word; b <- word }
        yield FilterSpec.Wildcard(f, s"$a?$b*"), // embedded ? defeats analyze_wildcard
      field.map(FilterSpec.Exists(_)),
      for {
        f <- field
        lo <- Gen.option(Gen.chooseNum(-99, 999).map(_.toString))
        hi <- Gen.option(Gen.chooseNum(-99, 999).map(_.toString))
        li <- Gen.oneOf(true, false); hiI <- Gen.oneOf(true, false)
      } yield FilterSpec.TermRange(f, lo, hi, li, hiI),
      Gen.const(FilterSpec.MatchAll))
    // composites avoid shapes render cannot re-parenthesize: And never
    // directly nests And (it renders flat), Not never wraps a bare And
    val orOfLeaves: Gen[FilterSpec] =
      Gen.listOfN(2, leaf).map(FilterSpec.Or(_))
    val andOfLeaves: Gen[FilterSpec] =
      Gen.listOfN(2, leaf).map(FilterSpec.And(_))
    val notG: Gen[FilterSpec] = Gen.oneOf(leaf, orOfLeaves).map(FilterSpec.Not(_))
    // the Lucene group-msm form `(a b c)~n`, n bounded by the group size
    val msmG: Gen[FilterSpec] = for {
      m <- Gen.chooseNum(2, 4)
      ls <- Gen.listOfN(m, leaf)
      n <- Gen.chooseNum(1, m)
    } yield FilterSpec.MinShouldMatch(n, ls)
    val tree: Gen[FilterSpec] = Gen.oneOf(
      leaf,
      Gen.listOfN(2, Gen.oneOf(leaf, orOfLeaves, notG, msmG)).map(FilterSpec.And(_)),
      Gen.listOfN(2, Gen.oneOf(leaf, andOfLeaves, notG)).map(FilterSpec.Or(_)),
      notG,
      msmG)
    check("query_string round-trip")(Prop.forAll(tree) { spec =>
      val got = QueryString.parse(spec.render, defaultField = "zzz")
      if (got != spec) println(s"MISMATCH: ${spec.render}\n  want $spec\n  got  $got")
      got == spec
    })
  }
}
