package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Text-analysis operators for large-scale training-data pipelines: token
  * counting, quality scoring, language identification, and content
  * fingerprinting. All pure `Column` algebra (codegen'd, no UDFs) so they run
  * inside whole-stage codegen over 100 TB of documents.
  *
  * Beyond the reference's surface (BASELINE.json north star): the reference
  * analyzes search corpora; these are the document-corpus analogues.
  */
object TextAnalysis {

  /** Whitespace token count; empty/blank text counts 0. */
  def tokenCount(c: Column): Column =
    when(length(trim(c)) === 0, 0).otherwise(size(split(trim(c), "\\s+")))

  /** BPE-ish subword count estimate: runs of letters, single digits, and
    * single non-space symbols — a regex approximation of byte-pair-encoding
    * token granularity (long words split less than punctuation-dense text).
    */
  def bpeTokenEstimate(c: Column): Column =
    regexp_count(c, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"))

  /** Characters of punctuation/symbols (not alphanumeric, not whitespace). */
  def punctCount(c: Column): Column = regexp_count(c, lit("[^A-Za-z0-9\\s]"))

  /** Flesch reading ease: `206.835 − 1.015·(words/sentences) −
    * 84.6·(syllables/words)` — the classic document-difficulty score a
    * pretraining quality pipeline bands corpora by. Counts are the
    * restatable heuristics: words = whitespace tokens, sentences =
    * terminator runs `[.!?]+`, syllables = vowel GROUPS (`[aeiouy]+`,
    * lowercased) — the standard approximation minus the silent-e
    * discount (stated simplification: vowel-less tokens count zero
    * syllables). Every count floors at 1 so empty/unpunctuated text
    * scores instead of dividing by zero. Pure integer counts + one fixed
    * arithmetic tree — the oracle restates it bit-exactly, no rounding.
    */
  def fleschReadingEase(c: Column): Column = {
    val words = greatest(size(split(trim(c), "\\s+")), lit(1)).cast("double")
    val sentences = greatest(regexp_count(c, lit("[.!?]+")), lit(1)).cast("double")
    val syllables = greatest(regexp_count(lower(c), lit("[aeiouy]+")), lit(1)).cast("double")
    lit(206.835) - lit(1.015) * (words / sentences) - lit(84.6) * (syllables / words)
  }

  /** Punctuation-to-character ratio; 0 for empty text. */
  def punctRatio(c: Column): Column =
    when(length(c) === 0, 0.0)
      .otherwise(punctCount(c).cast(DoubleType) / length(c).cast(DoubleType))

  /** English stopwords used for quality/language heuristics — a small, fixed
    * public list (the usual top function words).
    */
  val englishStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "are", "was",
    "were", "it", "that", "this", "for", "on", "with", "as", "by", "at",
    "from", "be", "not", "but", "he", "she", "they", "we", "you", "i")

  // Native codegen'd tokenizer — identical semantics to
  // `filter(split(lower(c), "[^a-z0-9]+"), length > 0)` without the
  // interpreted higher-order-function cost (see graft.expr.TextShingles).
  private def lowerTokens(c: Column): Column = graft.expr.TextShingles.tokenize(c)

  /** Fraction of tokens that are stopwords (for the given list); 0 when there
    * are no tokens. High-signal quality feature: natural prose has a stable
    * stopword ratio, boilerplate/code/tables do not.
    */
  def stopwordRatio(c: Column, stopwords: Seq[String] = englishStopwords): Column = {
    val toks = lowerTokens(c)
    val stops = array(stopwords.map(lit): _*)
    when(size(toks) === 0, 0.0).otherwise(
      graft.expr.TextShingles.countInSet(toks, stops).cast(DoubleType) /
        size(toks).cast(DoubleType))
  }

  /** Mean token length in characters; 0 when there are no tokens.
    *
    * Tokens are maximal `[a-z0-9]+` runs of the lowercased text, so the sum
    * of token lengths IS the count of alphanumeric characters — a codegen'd
    * `regexp_count`, not an interpreted `aggregate()` fold over the token
    * array (identical value, no per-element interpreted eval).
    */
  def meanTokenLength(c: Column): Column = {
    val toks = lowerTokens(c)
    when(size(toks) === 0, 0.0).otherwise(
      regexp_count(lower(c), lit("[a-z0-9]")).cast(DoubleType) /
        size(toks).cast(DoubleType))
  }

  /** Composite document quality score in [0, 1]: rewards reasonable length,
    * a natural stopword ratio, moderate punctuation, and word-like token
    * lengths. Deterministic closed formula — documented so downstream
    * filtering is reproducible:
    *
    * {{{
    * q = 0.25 * min(1, tokens/100)
    *   + 0.25 * (1 - |stopRatio - 0.4| / 0.4  clamped to [0,1])
    *   + 0.25 * (1 - min(1, punctRatio * 5))
    *   + 0.25 * (1 - min(1, |meanTokLen - 5| / 5))
    * }}}
    */
  def qualityScore(c: Column): Column = {
    val lengthScore = least(lit(1.0), tokenCount(c).cast(DoubleType) / 100.0)
    val stopScore = greatest(lit(0.0), lit(1.0) - abs(stopwordRatio(c) - 0.4) / 0.4)
    val punctScore = lit(1.0) - least(lit(1.0), punctRatio(c) * 5.0)
    val wordScore = lit(1.0) - least(lit(1.0), abs(meanTokenLength(c) - 5.0) / 5.0)
    (lengthScore + stopScore + punctScore + wordScore) * 0.25
  }

  /** Function-word profiles for the n-gram/stopword language-ID heuristic.
    * Latin-script languages score by function-word hits; CJK by codepoint
    * class. Public knowledge (standard function-word lists).
    */
  val languageProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "for", "with", "you", "this"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit", "von", "zu", "den"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "des", "du", "que", "pas", "pour", "dans"),
    "es" -> Seq("el", "la", "los", "las", "y", "es", "una", "del", "que", "no", "por", "para"),
  )

  /** Language-ID heuristic: per-language score = fraction of tokens found in
    * that language's function-word profile; CJK text short-circuits on Han
    * codepoints; below `minScore` the verdict is "und" (undetermined).
    * One fused codegen'd pass — see [[graft.expr.LanguageIdExpr]] for why
    * the algebraic formulation was ~20× the work per row.
    */
  def languageId(c: Column, minScore: Double = 0.05): Column =
    graft.expr.LanguageId.languageId(c, languageProfiles.toSeq, minScore)

  /** 64-bit content fingerprint: xxhash64 of the analyzer-normalized text, so
    * case/punctuation/whitespace variants collide — exact-dedup key for
    * near-identical formatting variants. Null-propagating: `xxhash64` alone
    * hashes a null argument to its seed (42), which would give undefined
    * content a real fingerprint; a null text must have a null fingerprint,
    * matching `md5`'s (and the DuckDB oracle's) null semantics.
    */
  def contentFingerprint(c: Column): Column = {
    val norm = trim(regexp_replace(lower(c), "[^a-z0-9]+", " "))
    when(norm.isNotNull, xxhash64(norm))
  }

  /** Portable 128-bit fingerprint: md5 hex of the same analyzer-normalized
    * text — bit-identical in any engine with `md5` (the DuckDB oracle
    * computes it directly), at ~2× the hash cost of [[contentFingerprint]].
    */
  def contentFingerprintHex(c: Column): Column =
    md5(trim(regexp_replace(lower(c), "[^a-z0-9]+", " ")))

  /** Rolling-hash shingle fingerprints: xxhash64 of each `k`-word shingle —
    * the building block for MinHash and winnowing-style fingerprint sets.
    */
  def shingleFingerprints(c: Column, k: Int): Column = {
    val toks = lowerTokens(c)
    val n = size(toks)
    when(n < k, array().cast("array<bigint>")).otherwise(
      transform(sequence(lit(0), n - k),
        i => xxhash64(concat_ws(" ", slice(toks, i + lit(1), lit(k))))))
  }

  // ===== PII redaction =====

  /** Redaction patterns, applied IN ORDER (emails first, so an address's
    * digit runs can't be re-matched as phone/SSN fragments; IPs last).
    * Deliberately restricted to the regex subset Java and RE2 agree on
    * (character classes, bounded quantifiers, `\b`, alternation — no
    * lookaround, no backreferences) so the DuckDB oracle replays the exact
    * chain with `regexp_replace(..., 'g')`.
    */
  val piiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "[EMAIL]",
    "\\b\\d{3}-\\d{2}-\\d{4}\\b" -> "[SSN]",
    "(\\(\\d{3}\\)\\s?|\\b\\d{3}[-.])\\d{3}[-.]\\d{4}\\b" -> "[PHONE]",
    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b" -> "[IP]")

  /** Scrub emails, SSNs, North-American phone numbers, and IPv4 addresses
    * to typed placeholder tokens — the standard pre-training privacy pass.
    * A fixed chain of codegen'd `regexp_replace` calls, row-local (no
    * shuffle, no UDF) at any corpus size. Pattern-based redaction is
    * recall-bounded by construction; an NER-model pass is out of scope for
    * an engine (run one via the Multimodal-style mapInPandas seam if
    * needed).
    */
  def redactPii(c: Column): Column =
    piiPatterns.foldLeft(c) { case (acc, (p, r)) => regexp_replace(acc, p, r) }

  /** Count of PII matches that [[redactPii]] would scrub: occurrences are
    * counted on the progressively redacted text, exactly mirroring the
    * replacement chain's precedence (an email's digits never double-count
    * as a phone number).
    */
  def piiMatchCount(c: Column): Column =
    piiPatterns.foldLeft((lit(0L), c)) { case ((cnt, txt), (p, r)) =>
      (cnt + regexp_count(txt, lit(p)).cast("long"), regexp_replace(txt, p, r))
    }._1

  // ===== Repetition signals (Gopher-style quality filters; Rae et al. 2021,
  // public paper). All per-row kernels — repetition is a per-document
  // property, so no shuffle is involved at any corpus size; see
  // [[graft.expr.GramStatsAlgo]] for the one-pass kernel and the corpus-wide
  // anti-pattern it avoids.

  /** Alphanumeric character count of the lowercased text — Σ token chars,
    * the Gopher denominators' "characters in the document".
    */
  def alnumCharCount(c: Column): Column =
    regexp_count(lower(c), lit("[a-z0-9]")).cast("long")

  /** Fraction of document characters contained in occurrences of the most
    * frequent word `n`-gram: `top_count · top_chars / alnum_chars` (0 when
    * the document has no chars or fewer than `n` tokens). High values mark
    * templated/boilerplate text (Gopher cuts ~0.20/0.18/0.16 at n=2/3/4).
    */
  def topNGramCharFrac(c: Column, n: Int): Column = {
    require(n >= 2, s"topNGramCharFrac: word n-grams need n >= 2, got $n")
    val st = graft.expr.GramStats(lowerTokens(c), n)
    val denom = alnumCharCount(c)
    when(denom === 0, 0.0).otherwise(
      (st.getField("top_count") * st.getField("top_chars")).cast(DoubleType) /
        denom.cast(DoubleType))
  }

  /** Fraction of document characters in word `n`-grams occurring more than
    * once (ALL their occurrences; overlapping grams re-count shared
    * characters, so heavily repetitive text can exceed 1 — documented
    * Gopher behavior, threshold there ~0.15 at n=5..10).
    */
  def dupNGramCharFrac(c: Column, n: Int): Column = {
    require(n >= 2, s"dupNGramCharFrac: word n-grams need n >= 2, got $n")
    val st = graft.expr.GramStats(lowerTokens(c), n)
    val denom = alnumCharCount(c)
    when(denom === 0, 0.0).otherwise(
      st.getField("dup_chars").cast(DoubleType) / denom.cast(DoubleType))
  }

  /** Fraction of (trimmed, non-empty) lines that are duplicates — all
    * occurrences of any repeated line, over the line count; 0 for documents
    * with no non-empty lines.
    */
  def dupLineFrac(c: Column): Column = {
    val st = graft.expr.GramStats(graft.expr.GramStats.lines(c), 1)
    when(st.getField("total") === 0, 0.0).otherwise(
      st.getField("dup_occurrences").cast(DoubleType) /
        st.getField("total").cast(DoubleType))
  }

  /** Character-weighted [[dupLineFrac]]: characters in duplicated lines over
    * characters in all lines (trimmed); 0 with no non-empty lines.
    */
  def dupLineCharFrac(c: Column): Column = {
    val st = graft.expr.GramStats(graft.expr.GramStats.lines(c), 1)
    when(st.getField("total_chars") === 0, 0.0).otherwise(
      st.getField("dup_chars").cast(DoubleType) /
        st.getField("total_chars").cast(DoubleType))
  }

  /** Per-document repetition profile — the Gopher repetition-filter feature
    * set as named columns. Runtime common-subexpression elimination shares
    * each n's kernel across the derived fractions (deterministic expression,
    * one eval per row per n in codegen).
    */
  def repetitionProfile(df: DataFrame, textCol: String): DataFrame = {
    val c = col(textCol)
    df.withColumn("top2gram_char_frac", topNGramCharFrac(c, 2))
      .withColumn("top3gram_char_frac", topNGramCharFrac(c, 3))
      .withColumn("dup5gram_char_frac", dupNGramCharFrac(c, 5))
      .withColumn("dup_line_frac", dupLineFrac(c))
      .withColumn("dup_line_char_frac", dupLineCharFrac(c))
  }

  // ===== Token-window chunking (retrieval/embedding prep) =====

  /** Split documents into overlapping fixed-token windows — the standard
    * retrieval/embedding chunking (context-window prep for RAG and
    * embedding pipelines). Chunk `i` covers whitespace-token range
    * `[i·(chunk−overlap), min(i·(chunk−overlap)+chunk, tok))`; the last
    * chunk may be short, and a document of ≤ `chunk` tokens yields exactly
    * one chunk. Pure row-local arithmetic + explode — no shuffle at any
    * corpus size; every offset is exact integer `div`, restated verbatim
    * in the `text_chunk_windows` oracle.
    *
    * Output: `(idCol, chunk, begin_tok, n_tok, chunk_text)`.
    */
  def chunkTokenWindows(
      df: DataFrame,
      idCol: String,
      textCol: String,
      chunkTokens: Int,
      overlap: Int): DataFrame = {
    require(chunkTokens > 0 && overlap >= 0 && overlap < chunkTokens,
      s"chunk: need 0 <= overlap < chunkTokens, got chunk=$chunkTokens overlap=$overlap")
    val step = chunkTokens - overlap
    val id = col(s"`$idCol`")
    val c = col(s"`$textCol`")
    val keyed = df
      .select(id, split(trim(c), "\\s+").as("_toks"), tokenCount(c).cast("long").as("_tok"))
      .where(col("_tok") > 0)
      // chunks = 1 + max(0, ceil((tok - chunk) / step))
      .withColumn("_n", lit(1L) + greatest(lit(0L),
        expr(s"(_tok - ${chunkTokens}L + ${step - 1}L) div ${step}L")))
    keyed
      .withColumn("chunk", explode(sequence(lit(0L), col("_n") - 1)))
      .withColumn("begin_tok", col("chunk") * step)
      .withColumn("n_tok", least(lit(chunkTokens.toLong), col("_tok") - col("begin_tok")))
      .select(id, col("chunk"), col("begin_tok"), col("n_tok"),
        concat_ws(" ", slice(col("_toks"), (col("begin_tok") + 1).cast("int"),
          col("n_tok").cast("int"))).as("chunk_text"))
  }

  // ===== Corpus vocabulary (mergeable frequent-items) =====

  /** Corpus-wide top terms as `(term, n)`, via Spark 4's `approx_top_k`
    * (DataSketches frequent-items underneath): bounded sketch state instead
    * of a corpus-wide exact aggregation — and EXACT whenever distinct terms
    * stay under `maxTracked` (the `vocab_topk` oracle relies on this).
    *
    * The estimate fetches ALL `maxTracked` slots — never an intermediate
    * cut — before the deterministic (count DESC, term ASC) re-sort and `k`
    * limit: a smaller fetch would let a count-tie group straddle the cut
    * and surface a sketch-order-dependent subset. With the full fetch,
    * output is deterministic and oracle-exact whenever the sketch itself
    * is exact; past `maxTracked` distinct terms, frequent-items is
    * inherently approximate (and says so — this is the documented contract,
    * not a silent cap).
    */
  def vocabTopK(df: DataFrame, textCol: String, k: Int, maxTracked: Int = 4096): DataFrame =
    df.select(explode(lowerTokens(col(s"`$textCol`"))).as("term"))
      .agg(expr(s"approx_top_k(term, $maxTracked, $maxTracked)").as("_t"))
      .select(explode(col("_t")).as("_e"))
      .select(col("_e.item").as("term"), col("_e.count").as("n"))
      .orderBy(desc("n"), asc("term"))
      .limit(k)

  /** Accumulated vocabulary sketch state for one ingest batch — merge with
    * [[vocabMerge]] under the same incremental-maintenance contract as the
    * dictionary's HLL/KLL increments: profile only the new partition,
    * combine kilobyte states, never re-scan the corpus.
    */
  def vocabState(df: DataFrame, textCol: String, maxTracked: Int = 4096): DataFrame =
    df.select(explode(lowerTokens(col(s"`$textCol`"))).as("term"))
      .agg(expr(s"approx_top_k_accumulate(term, $maxTracked)").as("_state"))

  /** Combine per-batch [[vocabState]] frames and estimate the top `k` —
    * same output shape and determinism contract as [[vocabTopK]] (full
    * `maxTracked` fetch before the deterministic cut).
    */
  def vocabMerge(states: Seq[DataFrame], k: Int, maxTracked: Int = 4096): DataFrame = {
    require(states.nonEmpty, "vocabMerge: no states")
    states.reduce(_ unionByName _)
      .agg(expr(s"approx_top_k_combine(_state, $maxTracked)").as("_state"))
      .select(expr(s"approx_top_k_estimate(_state, $maxTracked)").as("_t"))
      .select(explode(col("_t")).as("_e"))
      .select(col("_e.item").as("term"), col("_e.count").as("n"))
      .orderBy(desc("n"), asc("term"))
      .limit(k)
  }

  /** Boilerplate n-gram profile (the C4/RefinedWeb template-text signal):
    * a word n-gram occurring in at least `minDocFrac` of all documents is
    * "boilerplate" (navigation chrome, license headers, shared templates);
    * each document reports its distinct-gram count, how many of those are
    * boilerplate, and the ratio. Documents with fewer than `n` tokens have
    * no n-grams and are absent from the output (no signal either way).
    *
    * The threshold is a FRACTION of the corpus, not an absolute df, so the
    * cut is scale-invariant: the same 1% line means the same thing at sf0.01
    * and at 100 TB. Scale shape: one explode of per-doc DISTINCT gram
    * hashes (the inverted-index volume every ngram op here rides), a
    * partial-aggregated df count, and a broadcast of only the Zipf HEAD
    * (grams above the corpus-fraction line — few by construction) back onto
    * the gram stream; the per-doc rollup then partial-aggregates before its
    * single exchange. No corpus-sized state, no skewed window partitions.
    */
  def boilerplateProfile(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      minDocFrac: Double = 0.01): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    require(minDocFrac > 0 && minDocFrac <= 1,
      s"minDocFrac must be in (0, 1], got $minDocFrac")
    val grams = df.select(col(idCol),
      explode(graft.expr.TextShingles.shingleHashes(col(textCol), n)).as("_g"))
    val total = df.agg(count(lit(1)).as("_ndocs"))
    // per-doc grams are distinct by construction, so count(*) per gram IS
    // the document frequency
    val frequent = grams.groupBy("_g").agg(count(lit(1)).as("_df"))
      .crossJoin(broadcast(total))
      .where(col("_df") >= ceil(col("_ndocs") * lit(minDocFrac)))
      .select("_g")
    boilerplateProfileAgainst(df, idCol, textCol, n, frequent)
  }

  /** The per-document half of [[boilerplateProfile]] against an EXTERNAL
    * frequent-gram set (one `_g` gram-hash column) — the serving form when
    * the corpus df statistics live at rest (e.g. maintained from a stream
    * by [[graft.streaming.EventStreams.maintainGramDf]]): incoming
    * documents score against the corpus-so-far Zipf head without
    * re-scanning any corpus text.
    */
  def boilerplateProfileAgainst(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      frequentGrams: DataFrame): DataFrame = {
    val grams = df.select(col(idCol),
      explode(graft.expr.TextShingles.shingleHashes(col(textCol), n)).as("_g"))
    grams.join(broadcast(frequentGrams.select("_g")).withColumn("_hit", lit(1L)),
        Seq("_g"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        coalesce(sum(col("_hit")), lit(0L)).as("n_boilerplate"))
      // unrounded: an exact-integer quotient is bit-identical across
      // engines, while round() on small rationals hits .xxx5 ties the two
      // engines' round() break differently (same convention as profile())
      .withColumn("boilerplate_ratio",
        col("n_boilerplate").cast(DoubleType) / col("n_grams"))
  }

  /** The frequent-gram (Zipf head) set implied by an at-rest gram-df table
    * — `(gram, df)` rows plus ONE null-gram row carrying the total document
    * count, the shape [[graft.streaming.EventStreams.gramDfFromIncrements]]
    * merges to. The same corpus-fraction threshold as
    * [[boilerplateProfile]].
    */
  def boilerplateFrequent(gramDf: DataFrame, minDocFrac: Double): DataFrame = {
    require(minDocFrac > 0 && minDocFrac <= 1,
      s"minDocFrac must be in (0, 1], got $minDocFrac")
    val total = gramDf.where(col("gram").isNull)
      .agg(sum(col("df")).as("_ndocs"))
    gramDf.where(col("gram").isNotNull)
      .crossJoin(broadcast(total))
      .where(col("df") >= ceil(col("_ndocs") * lit(minDocFrac)))
      .select(col("gram").as("_g"))
  }

  /** Keep documents whose boilerplate ratio is at most `maxRatio` —
    * documents too short to have n-grams pass (no signal is not a
    * rejection, matching the quality-filter convention).
    */
  def boilerplateFilter(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      minDocFrac: Double = 0.01,
      maxRatio: Double = 0.5): DataFrame = {
    val drop = boilerplateProfile(df, idCol, textCol, n, minDocFrac)
      .where(col("boilerplate_ratio") > maxRatio)
      .select(col(idCol).as("_bp_drop"))
    // no broadcast hint: the drop set is corpus-proportional in the worst
    // case — let AQE pick broadcast when it measures small
    df.join(drop, df(idCol) === col("_bp_drop"), "left_anti")
  }

  /** Deflate-compressed size of the UTF-8 text (zlib level 6, raw
    * deflate): the numerator of the compression-ratio quality signal
    * RedPajama-v2 / CCNet-family pipelines carry — highly repetitive or
    * templated text compresses far below natural prose, and random noise
    * barely compresses at all, so BOTH tails are filterable on one
    * number. Deterministic for a given zlib implementation (the JDK
    * bundles one), row-local, no SQL-engine twin exists — spec-certified
    * (TextAnalysisSpec pins ordering properties, not magic byte counts).
    */
  def deflateLength(c: Column): Column = graft.expr.DeflateLen.deflateLength(c)

  /** `deflate_len / byte_len` ∈ (0, ~1.05]: low = repetitive/templated,
    * ~1 = incompressible noise, natural prose sits between. 1.0 for empty
    * text (nothing to judge).
    */
  def compressionRatio(c: Column): Column = {
    val bytes = octet_length(c)
    when(bytes === 0, 1.0)
      .otherwise(deflateLength(c).cast(DoubleType) / bytes.cast(DoubleType))
  }

  /** The stopwords of the Gopher rule battery (Rae et al. 2021, app. A):
    * a document must contain at least two of these to pass the final rule.
    * Distinct from [[englishStopwords]] (a ratio feature list) — this is
    * the published rule's own fixed 8-word set.
    */
  val gopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The Gopher document-level quality-rule battery (Rae et al. 2021,
    * "Scaling Language Models: ... Gopher", appendix A — the rule set
    * reused by MassiveWeb's descendants): per-document metrics and the
    * seven pass/fail rules, as one row-local codegen'd pass (regex counts
    * and Column algebra only — no UDFs, no shuffle at any corpus size).
    *
    * Metrics and rules (word = whitespace-delimited segment):
    *  - `word_count` ∈ [50, 100000]
    *  - `mean_word_len` (non-space chars / words) ∈ [3, 10]
    *  - `symbol_word_ratio` (count of `#`, `...`, `…` per word) ≤ 0.1
    *  - `alpha_word_frac` (words containing ≥1 [A-Za-z]) ≥ 0.8
    *  - `bullet_line_frac` (lines starting `-`/`*`/`•`) ≤ 0.9
    *  - `ellipsis_line_frac` (lines ending `...`/`…`) ≤ 0.3
    *  - `stopword_hits` (how many of [[gopherStopwords]] appear) ≥ 2
    *
    * `gopher_pass` is the conjunction. Complements [[qualityScore]] (a
    * soft composite) and [[repetitionProfile]] (Gopher's REPETITION rules,
    * separate battery): these are the hard document-shape gates. Every
    * count restates in ANSI SQL (`regexp_extract_all` lengths), so the
    * whole battery is oracle-checkable; line rules use `(?m)` anchors,
    * identical in Java regex and RE2.
    */
  def gopherProfile(df: DataFrame, textCol: String): DataFrame = {
    val c = col(s"`$textCol`")
    val nLines = (regexp_count(c, lit("\n")) + lit(1)).cast(DoubleType)
    val wc = col("word_count")
    val nonZero = wc > 0
    val profiled = df
      .withColumn("word_count", tokenCount(c).cast("long"))
      .withColumn("mean_word_len", when(!nonZero, 0.0).otherwise(
        regexp_count(c, lit("\\S")).cast(DoubleType) / wc.cast(DoubleType)))
      .withColumn("symbol_word_ratio", when(!nonZero, 0.0).otherwise(
        (regexp_count(c, lit("#")) + regexp_count(c, lit("\\.\\.\\.|…")))
          .cast(DoubleType) / wc.cast(DoubleType)))
      .withColumn("alpha_word_frac", when(!nonZero, 0.0).otherwise(
        regexp_count(c, lit("\\S*[A-Za-z]\\S*")).cast(DoubleType) /
          wc.cast(DoubleType)))
      .withColumn("bullet_line_frac",
        regexp_count(c, lit("(?m)^[ \\t]*[-*•]")).cast(DoubleType) / nLines)
      .withColumn("ellipsis_line_frac",
        regexp_count(c, lit("(?m)(\\.\\.\\.|…)[ \\t]*$")).cast(DoubleType) / nLines)
      .withColumn("stopword_hits", gopherStopwords.map(w =>
        when(c.rlike(s"(?i)\\b$w\\b"), 1).otherwise(0))
        .reduce(_ + _).cast("long"))
    profiled.withColumn("gopher_pass",
      wc.between(50L, 100000L) &&
        col("mean_word_len").between(3.0, 10.0) &&
        col("symbol_word_ratio") <= 0.1 &&
        col("alpha_word_frac") >= 0.8 &&
        col("bullet_line_frac") <= 0.9 &&
        col("ellipsis_line_frac") <= 0.3 &&
        col("stopword_hits") >= 2L)
  }

  /** Keep only documents passing every Gopher rule, original columns
    * unchanged — the filter stage over [[gopherProfile]]; still one
    * row-local scan (Catalyst collapses the projection into the filter).
    */
  def gopherFilter(df: DataFrame, textCol: String): DataFrame = {
    val metrics = Seq("word_count", "mean_word_len", "symbol_word_ratio",
      "alpha_word_frac", "bullet_line_frac", "ellipsis_line_frac",
      "stopword_hits", "gopher_pass")
    gopherProfile(df, textCol).where(col("gopher_pass")).drop(metrics: _*)
  }

  /** Full per-document text profile as named columns. */
  def profile(df: DataFrame, textCol: String): DataFrame = {
    val c = col(textCol)
    df.withColumn("token_count", tokenCount(c))
      .withColumn("bpe_token_estimate", bpeTokenEstimate(c))
      .withColumn("punct_ratio", punctRatio(c))
      .withColumn("stopword_ratio", stopwordRatio(c))
      .withColumn("mean_token_length", meanTokenLength(c))
      .withColumn("quality_score", qualityScore(c))
      .withColumn("lang_pred", languageId(c))
      .withColumn("fingerprint", contentFingerprint(c))
  }
}
