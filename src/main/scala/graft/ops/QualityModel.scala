package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-trained linear quality classifier — the "train fasttext on weak
  * labels, score everything" stage of published LLM-data pipelines (CCNet
  * and its descendants distill a cheap heuristic or a trusted-domain label
  * into a token-weight model, then filter the whole corpus by model score).
  * The reference has no model stage (its quality gates are the fixed
  * filters of SURVEY §2.3); this is the beyond-parity scale path: heuristics
  * re-tokenize every document on every evaluation, while a trained weight
  * table scores a 100 TB corpus with one broadcast hash join.
  *
  * Everything is INTEGER-exact so the whole pipeline — training and scoring
  * — restates in ANSI SQL and hash-matches across engines (the repo's
  * tfCosine/BIGINT-dot discipline):
  *
  *  - training counts document frequencies per (token, class) — integers;
  *  - weights are integer-quantized log-odds: the textbook w(t) =
  *    ln((pos_t+1)/(neg_t+1)) ranks tokens by their positive/negative odds
  *    ratio, and any monotone quantization of it preserves that ranking, so
  *    w(t) = SCALE*(pos_t+1) div (neg_t+1) − SCALE*(neg_t+1) div (pos_t+1)
  *    (floor division, both operands positive) is the same signal with no
  *    IEEE ln in sight — cross-engine floor-div is exact where ln's last
  *    ulp is not;
  *  - scores are Σ tf(d,t)·w(t) as BIGINT sums.
  *
  * Scale shape: training is two aggregations over the token posting
  * (per-(doc,token) distinct, then per-token conditional counts) — the
  * posting shuffle is the one corpus-sized exchange, and `minDf` prunes the
  * weight table to a broadcastable vocabulary (rare tokens carry no usable
  * signal and would dominate the table's cardinality). Scoring joins the
  * posting against the BROADCAST weight table and sums per document — no
  * second corpus shuffle beyond the per-doc aggregation.
  */
object QualityModel {

  /** Quantization scale for the integer odds-ratio weights. */
  val Scale = 1000L

  /** The integer-exact weak label the driver queries train on: length is
    * the one quality signal with an exact cross-engine form (ratio-based
    * signals compare IEEE doubles). Published pipelines' first gate is
    * likewise a length floor.
    */
  def lengthLabel(text: Column, minTokens: Int = 50): Column =
    TextAnalysis.tokenCount(text) >= minTokens

  /** Per-(doc, token) term frequencies over the analyzer's tokens — the
    * posting list training and scoring share.
    */
  private def posting(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), explode(graft.expr.TextShingles.tokenize(col(textCol))).as("t"))
      .groupBy(col(idCol), col("t"))
      .agg(count(lit(1)).as("tf"))

  /** Train integer token weights from weakly-labeled documents.
    *
    * @param label   boolean Column over the document row (the weak label);
    *                evaluated once per document, alongside the text.
    * @param minDf   keep tokens appearing in at least this many documents —
    *                bounds the weight table (broadcastable at any corpus
    *                size: |vocab with df ≥ k| ≤ corpus tokens / k).
    * @return (t, w) — one row per retained token, w a signed BIGINT.
    */
  def trainTokenWeights(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      label: Column,
      minDf: Int = 2): DataFrame = {
    val labeled = docs.select(col(idCol), label.as("_pos"))
    posting(docs, idCol, textCol)
      .join(labeled, idCol)
      .groupBy(col("t"))
      .agg(
        sum(when(col("_pos"), 1L).otherwise(0L)).as("pos_df"),
        sum(when(col("_pos"), 0L).otherwise(1L)).as("neg_df"))
      .where(col("pos_df") + col("neg_df") >= minDf)
      .select(col("t"),
        (expr(s"($Scale * (pos_df + 1)) div (neg_df + 1)")
          - expr(s"($Scale * (neg_df + 1)) div (pos_df + 1)")).as("w"))
  }

  /** Score every document: score = Σ tf·w over the trained vocabulary
    * (BIGINT), predicted = score > 0. Documents containing no weighted
    * token score 0 (and predict negative) rather than dropping out — the
    * filter downstream must see every document.
    */
  def scoreDocs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      weights: DataFrame): DataFrame = {
    val scores = posting(docs, idCol, textCol)
      .join(broadcast(weights), "t")
      .groupBy(col(idCol))
      .agg(sum(col("tf") * col("w")).as("score"))
    docs.select(col(idCol))
      .join(scores, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("score"), lit(0L)).as("score"),
        (coalesce(col("score"), lit(0L)) > 0L).as("predicted"))
  }

  /** Distill-and-score in one call: train on the weak label, score the same
    * corpus (the self-distillation round published pipelines run before
    * filtering; held-out scoring is the same `scoreDocs` on a second
    * frame).
    */
  def distill(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      label: Column,
      minDf: Int = 2): DataFrame =
    scoreDocs(docs, idCol, textCol,
      trainTokenWeights(docs, idCol, textCol, label, minDf))

  /** The classifier evaluation row beside [[auc]]: confusion-matrix
    * cells and the derived metrics — accuracy, precision, recall, F1,
    * and Cohen's kappa (chance-corrected agreement, the metric that
    * stays honest under class imbalance where accuracy flatters). Every
    * metric is ONE fixed IEEE tree over the four integer cells —
    * hash-exact cross-engine with no rounding escape; zero-denominator
    * cases yield null, never a blow-up.
    */
  def classifierReport(
      scored: DataFrame, predictedCol: String, labelCol: String): DataFrame = {
    val p = col(s"`$predictedCol`")
    val y = col(s"`$labelCol`")
    def cell(c: Column) = sum(when(c, 1L).otherwise(0L))
    val cells = scored.agg(
      cell(p && y).as("tp"), cell(p && !y).as("fp"),
      cell(!p && !y).as("tn"), cell(!p && y).as("fn"))
    def d(c: Column) = c.cast("double")
    def safe(num: Column, den: Column) =
      when(den === 0.0, lit(null).cast("double")).otherwise(num / den)
    val n = d(col("tp")) + d(col("fp")) + d(col("tn")) + d(col("fn"))
    val prec = safe(d(col("tp")), d(col("tp")) + d(col("fp")))
    val rec = safe(d(col("tp")), d(col("tp")) + d(col("fn")))
    val po = (d(col("tp")) + d(col("tn"))) / n
    val pe = ((d(col("tp")) + d(col("fp"))) * (d(col("tp")) + d(col("fn"))) +
      (d(col("fn")) + d(col("tn"))) * (d(col("fp")) + d(col("tn")))) / (n * n)
    cells.select(
      col("tp"), col("fp"), col("tn"), col("fn"),
      po.as("accuracy"),
      prec.as("precision"),
      rec.as("recall"),
      when(prec.isNull || rec.isNull || (prec + rec) === 0.0,
        lit(null).cast("double"))
        .otherwise(lit(2.0) * prec * rec / (prec + rec)).as("f1"),
      when(pe === 1.0, lit(null).cast("double"))
        .otherwise((po - pe) / (lit(1.0) - pe)).as("kappa"))
  }

  /** ROC AUC of a scored frame against boolean truth labels — the
    * classifier-evaluation row every holdout run should end with. The
    * Mann–Whitney rank-sum form with EXACT average-rank tie handling
    * (integer scores tie constantly): group by score, cumulative counts
    * give each tie group its average rank `before + (n+1)/2`, and
    *
    *   AUC = (Σ_pos rank − P(P+1)/2) / (P·N)
    *
    * Every addend is a multiple of 0.5 far below 2⁵³, so the sums are
    * EXACT in any aggregation order — no fold discipline needed; one
    * division at the end carries `round(·, 6)`. The score-group window
    * runs over the aggregated |distinct scores| frame, self-guarded
    * in-plan like [[graft.query.Aggs]]'s bounded-series windows. Output:
    * one row `(n_pos, n_neg, auc)` — `auc` null when a class is absent.
    */
  def auc(
      scored: DataFrame, scoreCol: String, labelCol: String,
      maxDistinctScores: Int = 1000000): DataFrame = {
    val grp = scored.groupBy(col(s"`$scoreCol`").as("_s"))
      .agg(count(lit(1)).as("_n"),
        sum(when(col(s"`$labelCol`"), 1L).otherwise(0L)).as("_np"))
    val ordered = Window.orderBy(col("_s"))
    val before = ordered.rowsBetween(Window.unboundedPreceding, -1)
    val totalGroups = count(lit(1)).over(
      ordered.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
    val guard = when(totalGroups > maxDistinctScores,
      raise_error(lit(s"auc: distinct scores exceed $maxDistinctScores — " +
        "quantize the score before evaluating")).cast("boolean"))
      .otherwise(lit(true))
    grp
      .withColumn("_before", coalesce(sum(col("_n")).over(before), lit(0L)))
      .withColumn("_ok", guard)
      .where(col("_ok"))
      .agg(
        sum(col("_np")).as("_P"),
        sum(col("_n") - col("_np")).as("_N"),
        sum(col("_np").cast("double") *
          (col("_before").cast("double") +
            (col("_n").cast("double") + 1.0) / 2.0)).as("_rs"))
      .select(
        col("_P").as("n_pos"), col("_N").as("n_neg"),
        when(col("_P") === 0 || col("_N") === 0, lit(null).cast("double"))
          .otherwise(round(
            (col("_rs") - col("_P").cast("double") * (col("_P").cast("double") + 1.0) / 2.0) /
              (col("_P").cast("double") * col("_N").cast("double")), 6)).as("auc"))
  }
}
