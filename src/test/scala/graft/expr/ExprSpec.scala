package graft.expr

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Custom Catalyst expressions: geohash (known vectors from the public
  * algorithm), text match, simhash, tokenize/shingles, vector kernels.
  */
class ExprSpec extends SparkSpecBase {
  import spark.implicits._

  // --- Geohash: vectors checkable against geohash.org ---

  test("geohash known vectors") {
    assert(GeohashAlgo.encode(57.64911, 10.40744, 11) === "u4pruydqqvj")
    assert(GeohashAlgo.encode(42.6, -5.6, 5) === "ezs42")
    assert(GeohashAlgo.encode(39.2904, -76.6122, 2) === "dq")  // Baltimore
    assert(GeohashAlgo.encode(0.0, 0.0, 1) === "s")
    assert(GeohashAlgo.encode(-90.0, -180.0, 4) === "0000")
  }

  test("geohash decode returns the encoding cell") {
    val h = GeohashAlgo.encode(48.8566, 2.3522, 6)
    val (latLo, latHi, lonLo, lonHi) = GeohashAlgo.decodeBounds(h)
    assert(latLo <= 48.8566 && 48.8566 <= latHi)
    assert(lonLo <= 2.3522 && 2.3522 <= lonHi)
    val (clat, clon) = GeohashAlgo.decodeCenter(h)
    assert(math.abs(clat - 48.8566) < 0.01 && math.abs(clon - 2.3522) < 0.01)
  }

  test("geohash expression works in a grouped plan (codegen path)") {
    val df = Seq((39.29, -76.61), (39.28, -76.60), (42.33, -83.04)).toDF("lat", "lon")
    val out = df.groupBy(Geohash.geohash(col("lat"), col("lon"), 2).as("gh"))
      .count().orderBy("gh").as[(String, Long)].collect()
    assert(out.toSeq === Seq(("dp", 1L), ("dq", 2L)))
  }

  test("geohash null propagation") {
    val df = Seq((Some(39.29), Some(-76.61)), (None, Some(1.0))).toDF("lat", "lon")
    val out = df.select(Geohash.geohash(col("lat"), col("lon"), 2)).collect()
    assert(out(0).getString(0) === "dq" && out(1).isNullAt(0))
  }

  // --- TextMatch ---

  test("analyze tokenizes like the analyzer") {
    assert(TextMatch.analyze("Hello, World-42!") === Seq("hello", "world", "42"))
    assert(TextMatch.analyze("  ") === Seq())
  }

  test("phrasePrefix: contiguous tokens, last as prefix, case-insensitive") {
    val df = Seq("Small Widget Assembly", "widget small", "smallish widget").toDF("t")
    def matches(q: String) =
      df.where(TextMatch.phrasePrefix(col("t"), q)).as[String].collect().toSet
    assert(matches("small wid") === Set("Small Widget Assembly"))
    assert(matches("WIDGET") === Set("Small Widget Assembly", "widget small", "smallish widget"))
    assert(matches("small") === Set("Small Widget Assembly", "widget small", "smallish widget"))
    // "small" must be a complete token for the two-token phrase to start there
    assert(matches("smallish wid") === Set("smallish widget"))
    assert(matches("") === Set("Small Widget Assembly", "widget small", "smallish widget"))
  }

  test("containsToken requires a whole token") {
    val df = Seq("smallish widget", "small widget").toDF("t")
    assert(df.where(TextMatch.containsToken(col("t"), "small")).as[String].collect().toSeq
      === Seq("small widget"))
  }

  test("analyzeUnicode: medial apostrophes kept, CJK segmented like Lucene StandardTokenizer") {
    // apostrophes: medial stays, trailing drops (UAX#29 MidNumLet)
    assert(TextMatch.analyzeUnicode("Don't stop the boys' game")
      === Seq("don't", "stop", "the", "boys", "game"))
    assert(TextMatch.analyzeUnicode("l’époque") === Seq("l’époque"))
    // Han: per-character tokens, mixed with Latin runs
    assert(TextMatch.analyzeUnicode("Spark是快速引擎abc")
      === Seq("spark", "是", "快", "速", "引", "擎", "abc"))
    // Hiragana per character; Katakana as a RUN (StandardTokenizer classes)
    assert(TextMatch.analyzeUnicode("これはテストです")
      === Seq("こ", "れ", "は", "テスト", "で", "す"))
    // Hangul as runs
    assert(TextMatch.analyzeUnicode("안녕하세요 world") === Seq("안녕하세요", "world"))
    // accents lowercase, digits join letters
    assert(TextMatch.analyzeUnicode("Café 42x") === Seq("café", "42x"))
    assert(TextMatch.analyzeUnicode(" …! ") === Seq())
  }

  test("phrasePrefixUnicode: executor column twin matches the driver analyzer, CJK prefix works") {
    val df = Seq("Spark是快速引擎", "don't panic now", "boys' toys", "これはテストです").toDF("t")
    def matches(q: String) =
      df.where(TextMatch.phrasePrefixUnicode(col("t"), q)).as[String].collect().toSet
    // CJK phrase-prefix: unigram stream "是 快 速..." — query "是快" is the
    // two-token phrase, present contiguously
    assert(matches("是快") === Set("Spark是快速引擎"))
    assert(matches("spark 是") === Set("Spark是快速引擎"))
    // apostrophe token matches whole, and as a prefix of itself
    assert(matches("don't pan") === Set("don't panic now"))
    // "don" alone is a PREFIX of "don't" (last-token prefix semantics)
    assert(matches("don") === Set("don't panic now"))
    // trailing apostrophe analyzed away on both sides
    assert(matches("boys toy") === Set("boys' toys"))
    // Katakana run is one token; its prefix matches
    assert(matches("テス") === Set("これはテストです"))
  }

  // --- Tokenize / shingles / minhash kernels ---

  test("native tokenizer matches the regex semantics") {
    import org.apache.spark.unsafe.types.UTF8String
    val cases = Seq("Hello, World!", "a1 b2-c3", "ALL CAPS 42", "", "---", "édgé çase")
    cases.foreach { s =>
      val expected = s.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
      assert(TextShingleAlgo.tokenize(UTF8String.fromString(s)).toSeq === expected, s"input: '$s'")
    }
  }

  test("shingle hashes equal xxhash64(concat_ws(' ', tokens)) and are distinct") {
    val df = Seq("the cat sat on the cat sat").toDF("t")
    val viaExpr = df.select(explode(TextShingles.shingleHashes(col("t"), 2)).as("h"))
      .as[Long].collect().toSeq
    // tokens: the cat sat on the cat sat → 2-shingles: "the cat","cat sat",
    // "sat on","on the","the cat","cat sat" → 4 distinct, first-seen order
    assert(viaExpr.length === 4)
    val viaSql = df.select(
      xxhash64(lit("the cat")), xxhash64(lit("cat sat")),
      xxhash64(lit("sat on")), xxhash64(lit("on the"))).collect().head
    assert(viaExpr === Seq(viaSql.getLong(0), viaSql.getLong(1), viaSql.getLong(2), viaSql.getLong(3)))
  }

  test("shingles below k tokens are empty") {
    val df = Seq("one").toDF("t")
    assert(df.select(size(TextShingles.shingleHashes(col("t"), 2))).as[Int].head() === 0)
  }

  test("minhash signature: deterministic, length n, dominated by set minima") {
    val df = Seq("a b c d e f g", "a b c d e f g", "x y z w v u t").toDF("t")
      .select(TextShingles.minhashSignature(TextShingles.shingleHashes(col("t"), 2), 16).as("sig"))
    val sigs = df.as[Seq[Long]].collect()
    assert(sigs(0).length === 16)
    assert(sigs(0) === sigs(1))      // identical text → identical signature
    assert(sigs(0) !== sigs(2))      // disjoint text → different signature
  }

  test("minhash signature agreement approximates jaccard") {
    // Two docs sharing most shingles should agree on most signature slots.
    val df = Seq(
      ("a b c d e f g h i j k l m n o p", "a b c d e f g h i j k l m n o q")
    ).toDF("t1", "t2").select(
      TextShingles.minhashSignature(TextShingles.shingleHashes(col("t1"), 2), 64).as("s1"),
      TextShingles.minhashSignature(TextShingles.shingleHashes(col("t2"), 2), 64).as("s2"))
    val (s1, s2) = df.as[(Seq[Long], Seq[Long])].head()
    val agree = s1.zip(s2).count { case (x, y) => x == y }
    assert(agree > 32, s"expected >50% agreement for ~0.76-jaccard docs, got $agree/64")
  }

  // --- SimHash ---

  test("simhash: identical tokens → distance 0; near text → small distance") {
    val df = Seq(
      ("the quick brown fox jumps over the lazy dog", "the quick brown fox jumps over the lazy dog"),
      ("the quick brown fox jumps over the lazy dog", "the quick brown fox jumped over the lazy dog"),
    ).toDF("a", "b").select(
      SimHash.simhash64(TextShingles.tokenize(col("a"))).as("ha"),
      SimHash.simhash64(TextShingles.tokenize(col("b"))).as("hb"))
    val rows = df.as[(Long, Long)].collect()
    assert(SimHashAlgo.hammingDistance(rows(0)._1, rows(0)._2) === 0)
    val d = SimHashAlgo.hammingDistance(rows(1)._1, rows(1)._2)
    assert(d > 0 && d <= 16, s"one-word change moved $d bits")
  }

  // --- Vector kernels ---

  test("dot and cosine against hand values") {
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, -5.0f, 6.0f))).toDF("a", "b")
    val (d, c) = df.select(
      VectorMath.dot(col("a"), col("b")),
      VectorMath.cosine(col("a"), col("b"))).as[(Double, Double)].head()
    assert(d === 12.0)
    val expected = 12.0 / (math.sqrt(14.0) * math.sqrt(77.0))
    assert(math.abs(c - expected) < 1e-12)
  }

  test("cosine of zero vector is 0, parallel vectors 1, opposite -1") {
    val df = Seq(
      (Seq(0.0, 0.0), Seq(1.0, 2.0)),
      (Seq(2.0, 4.0), Seq(1.0, 2.0)),
      (Seq(-1.0, -2.0), Seq(1.0, 2.0)),
    ).toDF("a", "b").select(VectorMath.cosine(col("a"), col("b")).as("c"))
    val cs = df.as[Double].collect()
    assert(cs(0) === 0.0)
    assert(math.abs(cs(1) - 1.0) < 1e-12)
    assert(math.abs(cs(2) + 1.0) < 1e-12)
  }

  test("vec_sum equals sequential fold, handles floats and empty arrays") {
    val df = Seq(
      Seq(1.5f, -2.0f, 4.0f),
      Seq.empty[Float],
    ).toDF("a").select(VectorMath.sum(col("a")).as("s"))
    assert(df.as[Double].collect().toSeq === Seq(3.5, 0.0))
  }

  test("ivf_cells ranks centroids by cosine with index tiebreak") {
    val centroids = Seq(
      Array(1.0, 0.0),   // cell 0
      Array(0.0, 1.0),   // cell 1
      Array(1.0, 1.0),   // cell 2
    )
    val df = Seq(
      Seq(2.0, 0.1),     // nearest: 0, then 2, then 1
      Seq(1.0, 1.0),     // ties 2 exactly; 0 and 1 tie -> index order
      Seq(0.0, 0.0),     // zero vector: all cosines 0 -> index order
    ).toDF("v")
    val out = df.select(CellAssign.nearestCells(col("v"), centroids, 3).as("cells"))
      .as[Seq[Int]].collect().toSeq
    assert(out === Seq(Seq(0, 2, 1), Seq(2, 0, 1), Seq(0, 1, 2)))
    // n caps at the centroid count; single-cell assignment is the argmax
    val one = df.select(CellAssign.nearestCells(col("v"), centroids, 1).as("c"))
      .as[Seq[Int]].collect().map(_.head).toSeq
    assert(one === Seq(0, 2, 0))
  }

  test("fingerprint analyzer: case/punct/order/repetition-invariant clustering key") {
    val docs = Seq(
      (1L, "The quick, BROWN fox!"),
      (2L, "fox quick brown the"),
      (3L, "brown brown FOX ... the --- quick"),
      (4L, "a different text"),
      (5L, ""),
    ).toDF("id", "text")
    val out = docs.select(col("id"), TextMatch.fingerprint(col("text")).as("fp"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) === "brown fox quick the")
    assert(out(2L) === out(1L) && out(3L) === out(1L),
      "reordered / repeated / re-punctuated copies must share the key")
    assert(out(4L) === "a different text")
    assert(out(5L) === "")
  }
}
