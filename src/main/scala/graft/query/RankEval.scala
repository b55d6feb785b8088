package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ES `rank_eval` — offline relevance evaluation of a ranked run against
  * a judged set: precision@k, recall@k, MRR (ES's reciprocal_rank), and
  * NDCG@k with binary gains (ES's dcg metric at its default gain
  * function). The API a search team uses to regression-test ranking
  * changes without a user in the loop.
  *
  * Determinism discipline: ranks are the (score desc, id asc)
  * row_number; the DCG and ideal-DCG sums are ORDERED rank-ascending
  * running-sum folds with the last value extracted by `max_by` (ties
  * impossible — ranks are distinct), the entropy-fold precedent, and the
  * final NDCG carries `round(·, 6)`; every other metric is one fixed
  * IEEE tree over integer counts. The run frame is ≤ k rows, so the
  * single-task windows here cost k rows — bounded by the API's own
  * contract, never by the corpus.
  */
object RankEval {

  /** Evaluate `run` (a ranked result frame: `idCol`, `scoreCol`, ≤ some
    * page of hits) against `relevantIds` (one `idCol` column — the full
    * judged-relevant set, which is what recall needs). Returns ONE row:
    * `(precision_at_k, recall_at_k, mrr, ndcg_at_k)`.
    */
  def evaluate(
      run: DataFrame,
      idCol: String,
      scoreCol: String,
      relevantIds: DataFrame,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val rankW = Window.orderBy(desc(scoreCol), asc(idCol))
    val rel = relevantIds.select(col(s"`$idCol`")).distinct()
      .withColumn("_rel", lit(true))
    val ranked = run
      .withColumn("_rank", row_number().over(rankW))
      .where(col("_rank") <= k)
      .join(rel, Seq(idCol), "left")
      .select(col("_rank"), coalesce(col("_rel"), lit(false)).as("_rel"))

    val hits = ranked.agg(
      sum(when(col("_rel"), 1L).otherwise(0L)).as("_h"),
      min(when(col("_rel"), col("_rank"))).as("_fr"))
    val tot = rel.agg(count(lit(1)).as("_r"))

    def log2Term(pos: org.apache.spark.sql.Column) =
      lit(1.0) / (log(pos + lit(1)) / log(lit(2.0)))
    val runFold = Window.orderBy(col("_rank"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dcg = ranked
      .withColumn("_t", when(col("_rel"), log2Term(col("_rank"))).otherwise(lit(0.0)))
      .withColumn("_s", sum(col("_t")).over(runFold))
      .agg(max_by(col("_s"), col("_rank")).as("_dcg"))

    val idealFold = Window.orderBy(col("_i"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val idcg = tot
      .select(explode(
        when(col("_r") >= 1,
          sequence(lit(1), least(lit(k), col("_r").cast("int"))))
          .otherwise(array().cast("array<int>"))).as("_i"))
      .withColumn("_s", sum(log2Term(col("_i"))).over(idealFold))
      .agg(max_by(col("_s"), col("_i")).as("_idcg"))

    hits.crossJoin(tot).crossJoin(dcg).crossJoin(idcg)
      .select(
        (col("_h").cast("double") / lit(k)).as("precision_at_k"),
        when(col("_r") === 0, lit(0.0))
          .otherwise(col("_h").cast("double") / col("_r").cast("double"))
          .as("recall_at_k"),
        when(col("_fr").isNull, lit(0.0))
          .otherwise(lit(1.0) / col("_fr").cast("double")).as("mrr"),
        when(col("_idcg").isNull || col("_idcg") === 0.0, lit(0.0))
          .otherwise(round(col("_dcg") / col("_idcg"), 6)).as("ndcg_at_k"))
  }
}
