package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-trained bigram language model with an integer-exact
  * perplexity-proxy score — the "LM perplexity filter" stage of published
  * LLM-data pipelines (CCNet scores every document with a KenLM 5-gram
  * model and keeps the low-perplexity head; Gopher and its descendants use
  * the same signal as one of their quality gates). The reference has no
  * model-based quality stage; this is beyond-parity alongside
  * [[QualityModel]] — that one distills a LABEL into token weights, this
  * one needs no label at all: the corpus itself is the training signal,
  * and the score is "how surprising is this document to a model of the
  * corpus" (template spam scores low, natural prose scores mid, garbage
  * scores high — filter both tails).
  *
  * Everything is INTEGER-exact so training and scoring restate in ANSI SQL
  * and hash-match across engines (the repo's tfCosine/odds-ratio
  * discipline). The textbook per-bigram cost is −log2 P(w2|w1) =
  * log2 c(w1) − log2 c(w1,w2); its monotone integer twin here is
  *
  *   cost(w1,w2) = ilog2(c1(w1)+1) − ilog2(c2(w1,w2)+1)
  *
  * with ilog2(n) = `length(bin(n))` = floor(log2 n)+1 — an exact integer
  * in both engines where log2's last ulp is not. c1 ≥ c2 always, so costs
  * are non-negative; an unseen bigram scores with c2 = 0, and a bigram
  * whose CONTEXT the pruned model has never seen costs the flat
  * [[NgramLm.OovCost]] (the "one in millions" surprise — deterministic,
  * not data-derived, so pruning can never make it negative). The document
  * score is the cost sum plus the flooring-division rate
  * `lm_bits_per_1k = (1000·cost) div bigrams` — the integer twin of
  * bits-per-token, which IS log2(perplexity): rank or threshold on it
  * exactly cross-engine.
  *
  * Scale shape (100 TB): training is ONE corpus-sized exchange — bigrams
  * are built row-locally (zip of the token array with its own tail, no
  * join, no window) and aggregated once; context totals come from the
  * already-aggregated bigram table (vocab-sized input). `minCount` prunes
  * the model to a broadcastable head — |{bigrams with count ≥ k}| ≤
  * total-bigram-occurrences / k, the same bound that caps every Zipf head
  * in this repo ([[TextAnalysis.boilerplateProfile]], [[QualityModel]]).
  * Scoring is row-local bigram explode → two BROADCAST joins → one per-doc
  * aggregation; the corpus is never shuffled by anything wider than its
  * own doc key.
  */
object NgramLm {

  /** Flat cost for a bigram whose context the pruned model does not know:
    * ilog2 of a ~16M-observation context against a single-observation
    * continuation. A constant (not data-derived) so the oracle restates it
    * literally and document ranks cannot shift when the corpus grows.
    */
  val OovCost = 24L

  /** ilog2(n+1) for n ≥ 0: `length(bin(n+1))` = floor(log2(n+1))+1.
    * Exact in Spark and DuckDB alike (`bin` renders the minimal binary
    * string in both).
    */
  private def ilog2p1(c: Column): Column = length(bin(c + lit(1L))).cast("long")

  /** Row-local (w1, w2) pairs from consecutive analyzer tokens: the token
    * array zipped with its own tail. No join, no window, no shuffle —
    * documents with fewer than two tokens yield an empty array.
    */
  private[ops] def bigramsCol(text: Column): Column = {
    val ts = graft.expr.TextShingles.tokenize(text)
    val n1 = greatest(size(ts) - 1, lit(0))
    zip_with(slice(ts, lit(1), n1), slice(ts, lit(2), n1),
      (a, b) => struct(a.as("w1"), b.as("w2")))
  }

  /** One bigram OCCURRENCE per row. The exploded stream feeds one
    * aggregation (training) or one broadcast join (scoring) — it is never
    * materialized at rest.
    */
  private def bigramStream(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), explode(bigramsCol(col(textCol))).as("_bg"))
      .select(col(idCol), col("_bg.w1").as("w1"), col("_bg.w2").as("w2"))

  /** Corpus bigram counts — the one corpus-sized exchange of training.
    * (w1, w2, c2), unpruned.
    */
  def bigramCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    bigramStream(docs, idCol, textCol)
      .groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c2"))

  /** The trained model: (bigram head, context totals), both pruned to
    * `minCount` so each broadcasts at any corpus size. Context totals are
    * aggregated from the FULL bigram-count table (so probabilities are
    * honest — pruning the head never changes a denominator), which is
    * already vocab-sized: no second corpus pass. c1 ≥ c2 guarantees every
    * retained bigram's context is retained too.
    */
  def train(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minCount: Int = 2): (DataFrame, DataFrame) = {
    val c2 = bigramCounts(docs, idCol, textCol)
    val contexts = c2.groupBy(col("w1"))
      .agg(sum(col("c2")).as("c1"))
      .where(col("c1") >= minCount)
    (c2.where(col("c2") >= minCount), contexts)
  }

  /** Score every document against a trained model: lm_cost = Σ per-bigram
    * cost (BIGINT), lm_bigrams = bigram positions, lm_bits_per_1k =
    * (1000·lm_cost) div lm_bigrams — the integer bits-per-bigram rate
    * (log2 perplexity ×1000). Documents with no bigram score (0, 0, 0)
    * rather than dropping out — a downstream filter must see every
    * document.
    */
  def scoreDocs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      bigrams: DataFrame,
      contexts: DataFrame): DataFrame = {
    val costed = bigramStream(docs, idCol, textCol)
      .join(broadcast(contexts), Seq("w1"), "left")
      .join(broadcast(bigrams), Seq("w1", "w2"), "left")
      .select(col(idCol),
        when(col("c1").isNull, lit(OovCost))
          .otherwise(ilog2p1(col("c1")) - ilog2p1(coalesce(col("c2"), lit(0L))))
          .as("_cost"))
    val agg = costed.groupBy(col(idCol))
      .agg(sum(col("_cost")).as("lm_cost"), count(lit(1)).as("lm_bigrams"))
    docs.select(col(idCol))
      .join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("lm_cost"), lit(0L)).as("lm_cost"),
        coalesce(col("lm_bigrams"), lit(0L)).as("lm_bigrams"),
        when(coalesce(col("lm_bigrams"), lit(0L)) === 0L, lit(0L))
          .otherwise(expr("(1000 * lm_cost) div lm_bigrams")).as("lm_bits_per_1k"))
  }

  /** Train-and-score in one call — the self-scoring round published
    * pipelines run before filtering (the corpus is its own training set;
    * a frozen model applied to a later batch is the same [[scoreDocs]] on
    * a second frame).
    */
  def perplexityScore(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minCount: Int = 2): DataFrame = {
    val (bg, ctx) = train(docs, idCol, textCol, minCount)
    scoreDocs(docs, idCol, textCol, bg, ctx)
  }

  /** Moore–Lewis intelligent selection (Moore & Lewis 2010, "Intelligent
    * Selection of Language Model Training Data" — the classic
    * cross-entropy-difference criterion behind most published
    * domain-selection pipelines, CCNet's head/tail split included):
    * train ONE model on the whole corpus and ONE on the in-domain slice
    * (`targetPred`), score every document with both, and rank by
    *
    *   ml_delta = target_bits_per_1k − corpus_bits_per_1k
    *
    * ascending — a document the TARGET model finds easier than the
    * general model is target-like; boilerplate every model finds easy
    * and garbage every model finds hard both cancel out, which is
    * exactly why the difference beats a single-model perplexity gate.
    * Both rates are this file's integer bits-per-1k, so the delta is
    * integer-exact and the selection restates cross-engine.
    *
    * Output: `(idCol, corpus_bits_per_1k, target_bits_per_1k, ml_delta)`
    * for every document. Scale shape: two [[train]] passes (one corpus
    * exchange each, the target one over the slice) and two broadcast-join
    * scorings — nothing wider than the doc key.
    */
  def contrastScores(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      targetPred: org.apache.spark.sql.Column,
      minCount: Int = 2): DataFrame = {
    val (cBg, cCtx) = train(docs, idCol, textCol, minCount)
    val (tBg, tCtx) = train(docs.where(targetPred), idCol, textCol, minCount)
    val corpus = scoreDocs(docs, idCol, textCol, cBg, cCtx)
      .select(col(idCol), col("lm_bits_per_1k").as("corpus_bits_per_1k"))
    val target = scoreDocs(docs, idCol, textCol, tBg, tCtx)
      .select(col(idCol), col("lm_bits_per_1k").as("target_bits_per_1k"))
    corpus.join(target, Seq(idCol))
      .withColumn("ml_delta",
        col("target_bits_per_1k") - col("corpus_bits_per_1k"))
  }

  /** The perplexity gate: keep documents inside [minBitsPer1k,
    * maxBitsPer1k]. Two-sided because both tails are suspect — near-zero
    * bits means the document is made of the corpus's most-repeated
    * machinery (templates, boilerplate), far-high bits means the model has
    * never seen its transitions (garbage, wrong language). Integer bounds
    * on an integer rate: the kept set is exact cross-engine.
    */
  def perplexityFilter(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minBitsPer1k: Long,
      maxBitsPer1k: Long,
      minCount: Int = 2): DataFrame = {
    val kept = perplexityScore(docs, idCol, textCol, minCount)
      .where(col("lm_bits_per_1k") >= minBitsPer1k &&
        col("lm_bits_per_1k") <= maxBitsPer1k)
      .select(col(idCol))
    docs.join(kept, Seq(idCol), "left_semi")
  }
}
