package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.expr.TextMatch

/** ES `_termvectors` — per-document term statistics for the analyzed
  * text field: each (document, term) with its in-document frequency and
  * the sorted 0-based token positions (the payload Kibana's term-vector
  * inspection and MLT debugging read; the reference's dual-field mapping
  * — `esindex.py:70-97` — keeps exactly this analyzed view at rest as
  * the `_split` companions, so this is its introspection API).
  *
  * One row-local explode + one aggregation keyed by (doc, term) — the
  * shuffle is by the output's own key, unavoidable and proportional to
  * the result. Positions sort in-plan (`sort_array`), so the row is
  * deterministic regardless of aggregation order.
  */
object TermVectors {

  def termVectors(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = split(trim(TextMatch.normalized(col(s"`$textCol`"))), " ")
    docs.select(col(s"`$idCol`"), posexplode(toks).as(Seq("pos", "term")))
      .where(col("term") =!= "")
      .groupBy(s"`$idCol`", "term")
      .agg(count(lit(1)).as("freq"),
        sort_array(collect_list(col("pos"))).as("positions"))
  }

  /** [[termVectors]] with `positions` rendered as a comma-joined string —
    * the comparator-safe scalar shape the correctness harness can
    * sort/hash (array-typed result columns crash its pandas comparator);
    * semantics identical, the join is a bijection on sorted int lists.
    */
  def termVectorsFlat(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    termVectors(docs, idCol, textCol).withColumn("positions",
      array_join(transform(col("positions"), _.cast("string")), ","))
}
