package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval: fuse lexical (BM25) and vector (ANN) result lists with
  * Reciprocal Rank Fusion — `score(d) = Σ_runs 1 / (k + rank_run(d))`
  * (Cormack/Clarke/Buettcher 2009, the public standard; k=60 theirs).
  * RRF needs only ranks, so it composes any retrievers without score
  * calibration — exactly how the reference's serving half would bolt vector
  * search onto its Elasticsearch text queries.
  *
  * Serving-scale shape: fusion runs AFTER each retriever's top-k, so every
  * frame here is ≤ k rows by construction — the unpartitioned rank window
  * and the full-outer joins are all bounded, single-task-cheap work on
  * k-row inputs (same bounded-by-construction argument as the IVF-PQ
  * codebook collects). The heavy lifting stays in the retrievers, which
  * keep their own 100 TB shapes.
  */
object Hybrid {

  /** Attach `rank` (1-based; `scoreCol` DESC, `idCol` ASC tie-break) to a
    * PRE-LIMITED top-k frame. The window is deliberately unpartitioned —
    * k-row retriever output only — and the contract is SELF-ENFORCED
    * in-plan: a full-frame count over the same single-task window (no
    * extra job) raises when the run exceeds `maxRows`, the signature that
    * a corpus-sized frame reached the fusion tier.
    */
  def withRank(run: DataFrame, scoreCol: String, idCol: String,
      maxRows: Int = 100000): DataFrame = {
    val w = Window.orderBy(desc(scoreCol), asc(idCol))
    val total = count(lit(1)).over(
      w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
    val guard = when(total > maxRows,
      raise_error(concat(
        lit("Hybrid.withRank: "), total.cast("string"),
        lit(s" rows exceed maxRows=$maxRows — rank only PRE-LIMITED " +
          "retriever output; limit the run to its top-k first")))
      .cast("boolean")).otherwise(lit(true))
    run.withColumn("rank", row_number().over(w))
      .withColumn("_bound_ok", guard)
      .where(col("_bound_ok"))
      .drop("_bound_ok")
  }

  /** Fuse ranked runs (each `(idCol, rankCol, …)`, pre-limited to their
    * top-k) into the RRF top-`topK`. Contributions sum in run order with
    * absent ranks contributing 0 — a fixed association the oracle restates
    * (two-term IEEE sums are order-exact anyway; the pinned order keeps
    * longer run lists deterministic too).
    */
  def rrf(runs: Seq[DataFrame], idCol: String, rankCol: String,
      rrfK: Int = 60, topK: Int = 10): DataFrame = {
    require(runs.nonEmpty, "rrf: no runs to fuse")
    val contribs = runs.zipWithIndex.map { case (r, i) =>
      r.select(col(s"`$idCol`"),
        (lit(1.0) / (lit(rrfK.toDouble) + col(s"`$rankCol`").cast("double"))).as(s"_c$i"))
    }
    val joined = contribs.reduce((a, b) => a.join(b, Seq(idCol), "full_outer"))
    val score = contribs.indices.map(i => coalesce(col(s"_c$i"), lit(0.0))).reduce(_ + _)
    joined
      .withColumn("rrf_score", score)
      .select(col(s"`$idCol`"), col("rrf_score"))
      .orderBy(desc("rrf_score"), asc(s"`$idCol`"))
      .limit(topK)
  }
}
