package graft.query

import graft.expr.TextMatch
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ES `more_like_this` — find documents similar to a seed document by
  * selecting its most characteristic terms and running a scored
  * disjunction (the "related items" panel next to a search result).
  *
  * Faithful shape (public MLT contract): the seed's terms are ranked by
  * `tf·idf` and the top `maxQueryTerms` survive (`min_term_freq` /
  * `min_doc_freq` prune rare-in-doc / rare-in-corpus terms first, ES's
  * own defaults 2 and 5); candidate documents containing at least one
  * selected term are scored with the SAME Okapi BM25 formula as
  * [[Bm25]] (ES scores MLT through its default similarity, which IS
  * BM25) and the top `k` return.
  *
  * Determinism discipline: term selection ties break on the term string;
  * the per-document score is an ORDERED fold — a running sum over
  * addends in term order, never a partition-order float sum — with
  * `round(·, 6)` absorbing sub-ulp `ln` library drift, exactly the
  * [[Aggs.entropyFromCharTable]] precedent. That is what lets the
  * DuckDB oracle restate the whole retrieval even though the selected
  * term set is DATA-dependent (the fixed-tree-per-literal-term trick of
  * [[Bm25.oracleSql]] cannot apply).
  *
  * 100 TB shape: tf/df/dl are one exploded aggregation each (map-side
  * combined); the selected-terms frame is ≤ `maxQueryTerms` rows,
  * broadcast; scoring touches only documents sharing a selected term
  * (the postings semi-join, not a corpus cross); top-k is
  * per-partition partial + k-row merge. At rest the tf table IS the
  * inverted index the search tier already maintains.
  */
object MoreLikeThis {

  /** Top-`k` documents most like `seedId`, as `(idCol, score)` ordered by
    * score descending (id ascending on ties). The seed itself is
    * excluded. See class doc for semantics and determinism.
    */
  def moreLikeThis(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      seedId: Long,
      maxQueryTerms: Int = 10,
      k: Int = 15,
      minTermFreq: Int = 2,
      minDocFreq: Int = 5,
      k1: Double = Bm25.DefaultK1,
      b: Double = Bm25.DefaultB): DataFrame = {
    require(maxQueryTerms >= 1, s"maxQueryTerms must be >= 1, got $maxQueryTerms")
    val id = col(s"`$idCol`")
    val toks = docs.select(id.as("_id"),
        explode(split(trim(TextMatch.normalized(col(s"`$textCol`"))), " +")).as("term"))
      .where(length(col("term")) > 0)
    val tf = toks.groupBy("_id", "term").agg(count(lit(1)).as("_tf"))
    val dl = tf.groupBy("_id").agg(sum(col("_tf")).as("_dl"))
    // N counts ALL documents (token-free ones included), matching the
    // oracle's count over the base table.
    val st = docs.agg(count(lit(1)).as("_n"))
      .crossJoin(dl.agg(sum(col("_dl")).as("_sumdl")))
    val df = tf.groupBy("term").agg(count(lit(1)).as("_df"))

    def idf(dfCol: Column): Column =
      log(lit(1.0) + (col("_n") - dfCol + lit(0.5)) / (dfCol + lit(0.5)))

    val sel = tf.where(col("_id") === seedId && col("_tf") >= minTermFreq)
      .join(df, "term").where(col("_df") >= minDocFreq)
      .crossJoin(broadcast(st))
      .orderBy((col("_tf").cast("double") * idf(col("_df"))).desc, col("term").asc)
      .limit(maxQueryTerms)
      .select("term", "_df")

    val avgdl = col("_sumdl").cast("double") / col("_n").cast("double")
    val dlNorm = lit(1.0) - lit(b) + lit(b) * (col("_dl").cast("double") / avgdl)
    val addend = idf(col("_df")) *
      ((col("_tf").cast("double") * (lit(k1) + lit(1.0))) /
        (col("_tf").cast("double") + lit(k1) * dlNorm))

    val adds = tf.where(col("_id") =!= seedId)
      .join(broadcast(sel), "term")
      .join(dl, "_id")
      .crossJoin(broadcast(st))
      .select(col("_id"), col("term"), addend.as("_a"))

    import org.apache.spark.sql.expressions.Window
    val run = Window.partitionBy(col("_id")).orderBy(col("term"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val last = Window.partitionBy(col("_id")).orderBy(col("term").desc)
    adds
      .withColumn("_s", sum(col("_a")).over(run))
      .withColumn("_rn", row_number().over(last))
      .where(col("_rn") === 1)
      .select(col("_id").as(idCol), round(col("_s"), 6).as("score"))
      .orderBy(desc("score"), asc(s"`$idCol`"))
      .limit(k)
  }

  /** DuckDB restatement of the full retrieval: identical analyzer,
    * identical integer tf/df/dl folds, identical IEEE selection and
    * scoring trees, the identical term-ordered running-sum fold and
    * `round(·, 6)` — see class doc.
    */
  def oracleSql(
      table: String,
      idCol: String,
      textExpr: String,
      seedId: Long,
      maxQueryTerms: Int = 10,
      k: Int = 15,
      minTermFreq: Int = 2,
      minDocFreq: Int = 5,
      k1: Double = Bm25.DefaultK1,
      b: Double = Bm25.DefaultB): String = {
    val idfOf = (df: String) => s"ln(1.0 + (st.n - $df + 0.5) / ($df + 0.5))"
    s"""WITH d AS (
       |  SELECT $idCol,
       |    list_filter(str_split_regex(trim(regexp_replace(lower($textExpr), '[^a-z0-9]+', ' ', 'g')), ' +'),
       |      x -> x <> '') AS toks
       |  FROM $table
       |), tf AS (
       |  SELECT $idCol, t AS term, count(*)::BIGINT AS tf
       |  FROM d, unnest(toks) AS u(t) GROUP BY 1, 2
       |), dl AS (
       |  SELECT $idCol, sum(tf)::BIGINT AS dl FROM tf GROUP BY 1
       |), st AS (
       |  SELECT (SELECT count(*)::BIGINT FROM $table) AS n,
       |    (SELECT sum(dl)::BIGINT FROM dl) AS sumdl
       |), dfx AS (
       |  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1
       |), sel AS (
       |  SELECT t.term, f.df FROM tf t JOIN dfx f USING (term), st
       |  WHERE t.$idCol = $seedId AND t.tf >= $minTermFreq AND f.df >= $minDocFreq
       |  ORDER BY t.tf::DOUBLE * ${idfOf("f.df")} DESC, t.term ASC
       |  LIMIT $maxQueryTerms
       |), adds AS (
       |  SELECT t.$idCol, t.term,
       |    ${idfOf("s.df")} *
       |      ((t.tf::DOUBLE * ($k1 + 1.0)) /
       |       (t.tf::DOUBLE + $k1 * (1.0 - $b + $b * (dl.dl::DOUBLE / (st.sumdl::DOUBLE / st.n::DOUBLE))))) AS a
       |  FROM tf t JOIN sel s USING (term) JOIN dl USING ($idCol), st
       |  WHERE t.$idCol <> $seedId
       |), folded AS (
       |  SELECT $idCol,
       |    sum(a) OVER (PARTITION BY $idCol ORDER BY term
       |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s,
       |    row_number() OVER (PARTITION BY $idCol ORDER BY term DESC) AS rn
       |  FROM adds
       |)
       |SELECT $idCol, round(s, 6) AS score FROM folded WHERE rn = 1
       |ORDER BY score DESC, $idCol ASC LIMIT $k""".stripMargin
  }
}
