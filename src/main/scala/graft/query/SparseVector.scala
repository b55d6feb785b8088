package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ES `sparse_vector` query — the learned-sparse-retrieval serving shape
  * (ELSER/SPLADE; ES 8.15's successor to `text_expansion`): documents
  * carry a sparse term→weight vector at rest, the query brings its own
  * `(term, weight)` list, and the score is the sparse dot product
  * `Σ_{t ∈ both} q_w(t) · d_w(t)` (Lucene executes it as summed
  * term-impact queries over the inverted index).
  *
  * Spark-first restatement: the at-rest representation is a POSTINGS
  * table `(id, term, weight)` — [[tfPostings]] explodes the analyzed
  * view with tf as the default impact weight (a learned-expansion
  * pipeline writes its own weights into the same schema; the serving
  * algebra is identical either way). Scoring is ONE broadcast hash join
  * of the postings against the query's literal rows + ONE hash
  * aggregate keyed by doc — work ∝ the postings of the QUERY'S terms
  * (the inverted-index property), never a per-document pass over full
  * texts; at corpus scale partition the postings table by `term` and
  * the scan prunes to the query's terms (the ivfRadius cell-pruning
  * discipline, term-keyed).
  *
  * Float discipline (the cross-engine oracle contract): document
  * weights from [[tfPostings]] are small integers and the fixture's
  * query weights are DYADIC (exact binary fractions), so every product
  * and the aggregation sum are IEEE-exact in any fold order — the same
  * reasoning as the BM25 integer-stats family. Arbitrary learned
  * weights make the sum order-dependent; callers needing bit-stable
  * scores under them should quantize to dyadics (SQ8-style) first.
  */
object SparseVector {

  /** tf-weighted postings of the analyzed text — the default at-rest
    * sparse vectors, `(idCol, term, weight)`. One explode + one count
    * aggregate keyed by the output's own key ([[TermVectors]] minus the
    * position list).
    */
  def tfPostings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    TermVectors.termVectors(docs, idCol, textCol)
      .select(col(s"`$idCol`"), col("term"),
        col("freq").cast("double").as("weight"))

  /** Sparse dot-product scores of every document sharing at least one
    * term with the query: broadcast the (term, weight) literals, join on
    * term, sum per doc. Duplicate query terms are a caller error (their
    * weights would double-count invisibly).
    */
  def score(postings: DataFrame, idCol: String,
      queryWeights: Seq[(String, Double)]): DataFrame = {
    require(queryWeights.nonEmpty, "sparse_vector: empty query")
    require(queryWeights.map(_._1).distinct.size == queryWeights.size,
      "sparse_vector: duplicate query terms")
    val spark = postings.sparkSession
    import spark.implicits._
    val q = queryWeights.toDF("term", "_qw")
    postings.join(broadcast(q), "term")
      .groupBy(col(s"`$idCol`"))
      .agg(sum(col("weight") * col("_qw")).as("score"))
  }

  /** Ranked page: (id, rank, score), score DESC with id tiebreak —
    * deterministic because the fixture scores are IEEE-exact (class
    * doc). The global window runs over the scored MATCH SET (docs
    * sharing a query term), which a selective sparse query keeps far
    * below corpus size; a stop-word-laden query should pre-prune its
    * weight list instead (the ES `prune` option's job).
    */
  def topK(postings: DataFrame, idCol: String,
      queryWeights: Seq[(String, Double)], k: Int): DataFrame = {
    require(k >= 1, s"sparse_vector: k must be >= 1, got $k")
    score(postings, idCol, queryWeights)
      .orderBy(desc("score"), asc(s"`$idCol`"))
      .limit(k)
      .withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(desc("score"), asc(s"`$idCol`"))))
      .select(col(s"`$idCol`"), col("rank"), col("score"))
  }
}
