package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Text-analysis operators: token counting, quality scoring, language ID,
  * fingerprinting.
  */
class TextAnalysisSpec extends SparkSpecBase {
  import spark.implicits._

  private def one(text: String, c: org.apache.spark.sql.Column): Double =
    Seq(text).toDF("t").select(c.cast("double")).as[Double].head()

  test("tokenCount: whitespace tokens, blank counts zero") {
    assert(one("the quick  brown\tfox", TextAnalysis.tokenCount(col("t"))) === 4.0)
    assert(one("   ", TextAnalysis.tokenCount(col("t"))) === 0.0)
    assert(one("", TextAnalysis.tokenCount(col("t"))) === 0.0)
  }

  test("bpeTokenEstimate: letter runs, single digits, single symbols") {
    // "ab12, c!" → [ab][1][2][,][c][!] = 6
    assert(one("ab12, c!", TextAnalysis.bpeTokenEstimate(col("t"))) === 6.0)
  }

  test("punctRatio bounded and zero for clean/empty text") {
    assert(one("", TextAnalysis.punctRatio(col("t"))) === 0.0)
    assert(one("abcd", TextAnalysis.punctRatio(col("t"))) === 0.0)
    assert(one("a,b!", TextAnalysis.punctRatio(col("t"))) === 0.5)
  }

  test("stopwordRatio on known text") {
    // tokens: the cat sat on the mat → stopwords: the, on, the = 3/6
    assert(one("the cat sat on the mat", TextAnalysis.stopwordRatio(col("t"))) === 0.5)
    assert(one("###", TextAnalysis.stopwordRatio(col("t"))) === 0.0)
  }

  test("meanTokenLength") {
    assert(one("ab cdef", TextAnalysis.meanTokenLength(col("t"))) === 3.0)
  }

  test("fleschReadingEase: hand value; floors keep empty text finite; harder text scores lower") {
    // "The cat sat. It ran!": 5 words, 2 sentence runs, 5 vowel groups
    // → 206.835 − 1.015·(5/2) − 84.6·(5/5) = 119.6975 exactly
    // (compare against the same double-op tree, not a re-parsed literal)
    assert(one("The cat sat. It ran!", TextAnalysis.fleschReadingEase(col("t")))
      === 206.835 - 1.015 * (5.0 / 2.0) - 84.6 * (5.0 / 5.0))
    // no terminators, no vowels → all counts floor at 1, stays finite
    val empty = one("", TextAnalysis.fleschReadingEase(col("t")))
    assert(!empty.asInstanceOf[Double].isNaN)
    // polysyllabic prose scores below simple prose
    val simple = one("The dog ran. The cat sat.", TextAnalysis.fleschReadingEase(col("t")))
    val hard = one("Incomprehensibility characterizes institutionalization.",
      TextAnalysis.fleschReadingEase(col("t")))
    assert(hard.asInstanceOf[Double] < simple.asInstanceOf[Double])
  }

  test("qualityScore is in [0,1], higher for prose than for noise") {
    val prose = "The quick brown fox jumps over the lazy dog while the sun sets " * 3
    val noise = "@@@ ### $$$ %%% ^^^ &&&"
    val qp = one(prose, TextAnalysis.qualityScore(col("t")))
    val qn = one(noise, TextAnalysis.qualityScore(col("t")))
    assert(qp >= 0 && qp <= 1 && qn >= 0 && qn <= 1)
    assert(qp > qn)
  }

  test("languageId picks function-word language; und below threshold; zh on Han text") {
    def lang(t: String) = Seq(t).toDF("t")
      .select(TextAnalysis.languageId(col("t"))).as[String].head()
    assert(lang("the cat is in the house and it is warm") === "en")
    assert(lang("der Hund ist nicht in der Wohnung und die Katze") === "de")
    assert(lang("le chat est dans la maison et il est pour") === "fr")
    assert(lang("el gato es una mascota y no es del perro") === "es")
    assert(lang("zxqv wkrt plmb") === "und")
    assert(lang("这是一个中文句子的测试文本") === "zh")
  }

  test("contentFingerprint collides for case/punctuation variants only") {
    val df = Seq("Hello, World!", "hello world", "hello  WORLD?", "hello there").toDF("t")
      .select(TextAnalysis.contentFingerprint(col("t")).as("fp")).as[Long].collect()
    assert(df(0) === df(1) && df(1) === df(2))
    assert(df(0) !== df(3))
  }

  test("shingleFingerprints: n-k+1 rolling hashes, empty below k") {
    val n = Seq("a b c d").toDF("t")
      .select(size(TextAnalysis.shingleFingerprints(col("t"), 2))).as[Int].head()
    assert(n === 3)
    val short = Seq("a").toDF("t")
      .select(size(TextAnalysis.shingleFingerprints(col("t"), 2))).as[Int].head()
    assert(short === 0)
  }

  test("profile emits all named feature columns") {
    val cols = TextAnalysis.profile(Seq((1L, "some text")).toDF("id", "text"), "text").columns.toSet
    assert(Set("token_count", "bpe_token_estimate", "punct_ratio", "stopword_ratio",
      "mean_token_length", "punct_ratio", "quality_score", "lang_pred", "fingerprint").subsetOf(cols))
  }

  private def redact(text: String): String =
    Seq(text).toDF("t").select(TextAnalysis.redactPii(col("t"))).as[String].head()

  test("redactPii scrubs emails, SSNs, phones, and IPv4s to typed tokens") {
    assert(redact("mail jane.doe+spam@sub.example.co.uk now") == "mail [EMAIL] now")
    assert(redact("ssn is 078-05-1120.") == "ssn is [SSN].")
    assert(redact("call 555-867-5309 or (415) 555-0100 or 415.555.0100") ==
      "call [PHONE] or [PHONE] or [PHONE]")
    assert(redact("ping 10.0.255.1 then 192.168.0.254") == "ping [IP] then [IP]")
  }

  test("redactPii precedence: email digits never re-match as phone/SSN/IP") {
    assert(redact("a 078-05-1120@x.io b") == "a [EMAIL] b")
    // SSN beats the phone pattern on 3-2-4 grouping; phone needs 3-3-4.
    assert(redact("078-05-1120 and 078-051-1203") == "[SSN] and [PHONE]")
  }

  test("redactPii leaves clean text untouched") {
    val s = "three words here, version 4.1 at 12:30"
    assert(redact(s) == s)
  }

  test("chunkTokenWindows: overlap arithmetic, short tails, single-chunk docs") {
    val docs = Seq(
      (1L, (1 to 9).map(i => s"t$i").mkString(" ")), // 9 tokens
      (2L, "a b c"),                                 // fits in one chunk
      (3L, "")                                       // dropped
    ).toDF("doc_id", "text")
    val got = TextAnalysis.chunkTokenWindows(docs, "doc_id", "text", chunkTokens = 4, overlap = 2)
      .orderBy("doc_id", "chunk")
      .select("doc_id", "chunk", "begin_tok", "n_tok", "chunk_text")
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    // doc 1: ceil((9-4)/2) = 3 extra starts → 0,2,4,6; the last is short
    val doc1 = got.filter(_._1 == 1L)
    assert(doc1.map(c => (c._3, c._4)) == Seq((0L, 4L), (2L, 4L), (4L, 4L), (6L, 3L)))
    assert(doc1.head._5 == "t1 t2 t3 t4" && doc1.last._5 == "t7 t8 t9")
    // consecutive chunks overlap by exactly 2 tokens
    doc1.sliding(2).foreach { case Seq(a, b) => assert(b._3 - a._3 == 2) case _ => }
    assert(got.filter(_._1 == 2L).map(c => (c._2, c._4, c._5)) == Seq((0L, 3L, "a b c")))
    assert(!got.exists(_._1 == 3L))
  }

  test("vocabTopK: exact counts under maxTracked, split-merge equals whole") {
    val docs = Seq(
      (0L, "apple banana apple cherry"),
      (1L, "banana apple banana banana"),
      (2L, "cherry apple")
    ).toDF("doc_id", "text")
    val whole = TextAnalysis.vocabTopK(docs, "text", k = 3)
      .as[(String, Long)].collect().toSeq
    // apple and banana tie at 4 — term ASC breaks it deterministically
    assert(whole == Seq(("apple", 4L), ("banana", 4L), ("cherry", 2L)))
    val states = Seq(
      TextAnalysis.vocabState(docs.where(col("doc_id") < 2), "text"),
      TextAnalysis.vocabState(docs.where(col("doc_id") >= 2), "text"))
    val merged = TextAnalysis.vocabMerge(states, k = 3)
      .as[(String, Long)].collect().toSeq
    assert(merged == whole)
  }

  test("boilerplateProfile: corpus-frequent grams flagged, short docs absent") {
    val docs = Seq(
      (1L, "visit our website today alpha beta"),
      (2L, "visit our website today gamma delta"),
      (3L, "visit our website today epsilon zeta"),
      (4L, "visit our website today eta theta"),
      (5L, "visit our website today iota kappa"),
      (6L, "unique text one two three four"),
      (7L, "hi there") // two tokens: no 3-gram, absent from the profile
    ).toDF("doc_id", "text")
    val p = TextAnalysis.boilerplateProfile(docs, "doc_id", "text",
        n = 3, minDocFrac = 0.5) // threshold = ceil(7 * 0.5) = 4 docs
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    // docs 1-5: 4 grams each, the two template grams (df=5 >= 4) flagged
    assert(p.map(_._1) == Seq(1L, 2L, 3L, 4L, 5L, 6L))
    p.take(5).foreach { case (_, nGrams, nBp, ratio) =>
      assert(nGrams == 4L && nBp == 2L && ratio == 0.5)
    }
    assert(p(5) == ((6L, 4L, 0L, 0.0)))
  }

  test("boilerplateFilter: high-ratio docs dropped, no-signal docs kept") {
    val docs = Seq(
      (1L, "visit our website today alpha beta"),
      (2L, "visit our website today gamma delta"),
      (3L, "visit our website today epsilon zeta"),
      (4L, "visit our website today eta theta"),
      (5L, "visit our website today iota kappa"),
      (6L, "unique text one two three four"),
      (7L, "hi there")
    ).toDF("doc_id", "text")
    val kept = TextAnalysis.boilerplateFilter(docs, "doc_id", "text",
        n = 3, minDocFrac = 0.5, maxRatio = 0.4)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(6L, 7L))
  }

  test("piiMatchCount counts scrubbed entities with chain precedence") {
    val df = Seq(
      ("a@b.io and 10.0.0.1 and 555-867-5309", 3L),
      ("no pii at all", 0L),
      ("078-05-1120@x.io", 1L) // one email, not an SSN
    ).toDF("t", "want")
    val got = df.select(TextAnalysis.piiMatchCount(col("t")).as("got"), col("want"))
      .as[(Long, Long)].collect()
    got.foreach { case (g, w) => assert(g == w) }
  }

  // ---- Gopher rule battery ----

  /** A document passing every Gopher rule: 60 natural words with the
    * stopwords "the"/"and" present, no symbols, no list structure.
    */
  private val goodDoc: String =
    (1 to 12).map(_ => "the quick brown fox and hound").mkString(" ")

  private def gopherRow(text: String) =
    TextAnalysis.gopherProfile(Seq((1L, text)).toDF("id", "t"), "t")
      .select("word_count", "mean_word_len", "symbol_word_ratio",
        "alpha_word_frac", "bullet_line_frac", "ellipsis_line_frac",
        "stopword_hits", "gopher_pass")
      .as[(Long, Double, Double, Double, Double, Double, Long, Boolean)]
      .head()

  test("gopherProfile passes a natural document and reports its metrics") {
    val (wc, mwl, sym, alpha, bullet, ell, stops, pass) = gopherRow(goodDoc)
    assert(wc === 72L)
    assert(mwl === (goodDoc.count(!_.isWhitespace).toDouble / 72))
    assert(sym === 0.0 && alpha === 1.0 && bullet === 0.0 && ell === 0.0)
    assert(stops === 2L) // "the" and "and"
    assert(pass)
  }

  test("gopherProfile word-count bounds: short documents fail rule 1") {
    val (wc, _, _, _, _, _, _, pass) = gopherRow("the cat and the hat")
    assert(wc === 5L && !pass)
  }

  test("gopherProfile counts bullet and ellipsis lines with (?m) anchors") {
    val listy = Seq("- alpha item", "* beta item", "  • gamma item",
      "plain line", "trailing dots...", "unicode dots…").mkString("\n")
    val (_, _, _, _, bullet, ell, _, _) = gopherRow(listy)
    assert(bullet === 3.0 / 6)
    assert(ell === 2.0 / 6)
    // 90%-bullet documents fail the bullet rule even when long enough
    val allBullets = (1 to 60).map(i => s"- the item and part $i").mkString("\n")
    assert(!gopherRow(allBullets)._8)
  }

  test("gopherProfile symbol ratio counts #, ... and … per word") {
    val symDoc = goodDoc + " " + (1 to 10).map(_ => "# tag ... more").mkString(" ")
    val (wc, _, sym, _, _, _, _, pass) = gopherRow(symDoc)
    assert(sym === 20.0 / wc && !pass) // 10 hashes + 10 ellipses over words
  }

  test("gopherProfile alpha-word fraction and stopword floor") {
    // 60 numeric words: alpha fraction 0, zero Gopher stopwords
    val numeric = (1 to 60).map(_.toString).mkString(" ")
    val (_, _, _, alpha, _, _, stops, pass) = gopherRow(numeric)
    assert(alpha === 0.0 && stops === 0L && !pass)
    // mixed alnum words still count as alphabetic
    assert(gopherRow("ab12 34cd x9")._4 === 1.0)
  }

  test("compressionRatio orders repetitive < prose < noise; empty is 1.0") {
    val repetitive = "spam spam spam spam " * 40
    val prose = ("the committee reviewed seventeen proposals during autumn " +
      "sessions and deferred several pending further analysis of costs ") * 5
    val noise = (1 to 800).map(i =>
      Integer.toString((i * 2654435761L % 1679616).toInt, 36)).mkString(" ")
    def ratio(s: String) = one(s, TextAnalysis.compressionRatio(col("t")))
    assert(ratio(repetitive) < ratio(prose), "templated text must compress harder")
    assert(ratio(prose) < ratio(noise), "noise must compress worse than prose")
    assert(ratio(repetitive) < 0.1)
    assert(ratio("") === 1.0)
    // deterministic across invocations (a fixed zlib level)
    assert(ratio(prose) === ratio(prose))
  }

  test("gopherFilter keeps passing rows with original columns only") {
    val df = Seq((1L, goodDoc), (2L, "too short")).toDF("id", "t")
    val out = TextAnalysis.gopherFilter(df, "t")
    assert(out.columns.toSeq === Seq("id", "t"))
    assert(out.select("id").as[Long].collect().toSeq === Seq(1L))
  }
}
