package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ES `nested` field type + `nested` query — the mapping decision behind
  * every parent-with-line-items document (orders with items, users with
  * addresses). The semantics the feature exists for:
  *
  *  - **nested mapping**: each array element is its own hidden Lucene doc;
  *    a `nested` query's conditions must all hold on the SAME element.
  *  - **object (default) mapping**: ES flattens `items.quantity` and
  *    `items.discount` into independent value arrays — a bool.must of two
  *    conditions matches when ANY element satisfies each condition
  *    separately, the classic cross-element false positive (at the
  *    reference scale, 2.3× the matches of the correct nested form —
  *    `q_nested_query`).
  *
  * Spark-first restatement: the nested document IS an
  * `array<struct<...>>` column; [[nestedMatch]] is one `exists` HOF over
  * it (row-local, the predicate sees the whole element struct) and
  * [[objectMatch]] is the flattened-mapping emulation (independent
  * `exists` per condition). No custom plan node needed — the array
  * construction is one `collect_list(struct(...))` hash aggregate
  * ([[nest]]), bounded by elements-per-parent (TPC-H: ≤7 items/order),
  * and the predicates are codegen'd column algebra.
  */
object NestedDocs {

  /** Materialize child rows as the parent's nested-doc array:
    * `groupBy(parentKey).agg(collect_list(struct(itemCols)))` — ONE hash
    * aggregate keyed on the parent (map-side partial collect applies;
    * array size is bounded by children-per-parent, not corpus size).
    *
    * `maxChildren` ENFORCES that bound in-plan (round-15 verdict #3: the
    * bound was a data contract, not an enforcement — one skewed parent
    * silently builds an arbitrarily large aggregation array): a row-local
    * `size` check on the aggregate output raises loudly, naming the
    * parent, at the same materialization. The check sits AFTER the
    * collect (zero extra exchange — the pre-aggregation window-count
    * alternative costs a second full shuffle of the children and buffers
    * the same skewed partition anyway); its job is loudness at the first
    * action, not allocation avoidance. TPC-H orders hold ≤7 items; the
    * default is generous for any real parent-with-line-items shape while
    * still catching a hot-key join explosion.
    */
  def nest(children: DataFrame, parentKey: String,
      itemCols: Seq[String], as: String = "items",
      maxChildren: Int = 10000): DataFrame = {
    require(itemCols.nonEmpty, "nest: no item columns")
    require(maxChildren >= 1, s"nest: maxChildren must be >= 1, got $maxChildren")
    children.groupBy(col(parentKey))
      .agg(collect_list(struct(itemCols.map(col): _*)).as(as))
      .withColumn("_bound_ok",
        when(size(col(as)) > maxChildren,
          raise_error(concat(
            lit("NestedDocs.nest: parent "), col(parentKey).cast("string"),
            lit(" has "), size(col(as)).cast("string"),
            lit(s" children > maxChildren=$maxChildren — a skewed parent " +
              "builds an unbounded nested-doc array; filter or chunk the " +
              "children (the Features chunkMs precedent) or raise the " +
              "bound deliberately"))).cast("boolean"))
          .otherwise(lit(true)))
      .where(col("_bound_ok"))
      .drop("_bound_ok")
  }

  /** ES `nested` query: SOME element satisfies the WHOLE predicate —
    * conditions are evaluated on the same element (the predicate receives
    * the element struct; access fields with `_("name")`).
    */
  def nestedMatch(items: Column, pred: Column => Column): Column =
    exists(items, pred)

  /** The object-mapping (flattened) semantics for the SAME conditions —
    * each condition independently satisfied by ANY element. Provided as
    * the explicit, named emulation so the divergence is a tested fact
    * rather than a silent mapping default.
    */
  def objectMatch(items: Column, preds: Seq[Column => Column]): Column = {
    require(preds.nonEmpty, "objectMatch: no conditions")
    preds.map(p => exists(items, p)).reduce(_ && _)
  }

  /** ES `nested` aggregation + `reverse_nested`, in one pass — the agg
    * pair SURVEY §2.7 originally declared out of scope because the flat
    * harmonized schema had no nested documents; [[nest]] changed that
    * premise, so the pair is now exact: bucket the CHILD documents of a
    * nested-array column by a child expression, reporting both the
    * nested scope's `doc_count` (child docs per bucket — what ES counts
    * inside `nested`) and the `reverse_nested` `parent_count` (distinct
    * parents owning at least one such child — "how many orders contain
    * a returned item", not "how many returned items").
    *
    * Shape: one bounded explode (array size is [[nest]]'s enforced
    * `maxChildren`) into the standard two-phase distinct aggregation —
    * a partial (bucket, parent) dedup feeding the counts, ONE exchange
    * on the bucket key, and NO Expand (a single distinct column never
    * triggers it). No join — the parent key travels with its exploded
    * children.
    */
  def nestedAgg(parents: DataFrame, parentKey: String, itemsCol: String,
      childExpr: Column => Column, as: String = "key"): DataFrame =
    parents
      .select(col(s"`$parentKey`"), explode(col(s"`$itemsCol`")).as("_item"))
      .select(col(s"`$parentKey`"), childExpr(col("_item")).as(as))
      .groupBy(col(s"`$as`"))
      .agg(count(lit(1)).as("doc_count"),
        countDistinct(col(s"`$parentKey`")).as("parent_count"))
}
