package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ES `join` field type — parent and child documents in one index,
  * related at query time (`has_child`, `has_parent`, `parent_id`
  * queries; `children`/`parent` aggregations). The join field is ES's
  * OTHER parent-with-line-items answer, for when children update
  * independently of their parent so nesting them into one document
  * ([[NestedDocs]]) would force a parent reindex per child write — at
  * the cost of a query-time join ES itself documents as expensive.
  *
  * Spark-first restatement: parents and children are two DataFrames
  * sharing a key — the join ES hides inside one index is an ORDINARY
  * relational join here, so every Catalyst join strategy applies
  * directly where ES is confined to its in-shard global-ordinals map
  * (the reason ES join-field queries cannot cross shards and routing
  * must co-locate a family — the exact constraint a co-bucketed layout
  * reproduces deliberately, see the 100 TB notes per method).
  */
object JoinField {

  /** ES `has_child` — PARENT docs with `minChildren`..`maxChildren`
    * children matching `childFilter` (both bounds count MATCHING
    * children, ES semantics; the defaults are ES's: at least one, no
    * upper bound).
    *
    * Plan shape: at the default bounds this is ONE left-semi join of
    * parents against the filtered children — no aggregate at all (the
    * semi-join short-circuits on the first matching child, and AQE
    * broadcasts the filtered side when selective). With a real count
    * bound the filtered children take ONE partial+final hash aggregate
    * keyed by the parent key (map-side combine shrinks the shuffle to
    * distinct parents) before the same semi-join. At 100 TB: both
    * exchanges key on the parent key, so co-bucketing parents and
    * children on it (the TableStore bucketed-join layout — ES's routing
    * requirement, reproduced on purpose) makes the whole query
    * exchange-free.
    */
  def hasChild(parents: DataFrame, children: DataFrame,
      parentKey: String, childKey: String, childFilter: Column,
      minChildren: Int = 1, maxChildren: Int = Int.MaxValue): DataFrame = {
    require(minChildren >= 1,
      s"has_child: min_children must be >= 1, got $minChildren (ES treats " +
        "0 as 'no constraint', which is match-all-parents — say what you mean)")
    require(maxChildren >= minChildren,
      s"has_child: max_children ($maxChildren) < min_children ($minChildren)")
    val matching =
      if (minChildren == 1 && maxChildren == Int.MaxValue)
        children.where(childFilter).select(col(childKey).as("_pk"))
      else
        children.where(childFilter)
          .groupBy(col(childKey).as("_pk")).agg(count(lit(1)).as("_n"))
          .where(col("_n") >= minChildren && col("_n") <= maxChildren)
          .select("_pk")
    parents.join(matching, parents(parentKey) === matching("_pk"), "left_semi")
  }

  /** ES `has_child` with a `score_mode` — the SCORED form: each parent's
    * relevance is the `min`/`max`/`sum`/`avg` of its matching children's
    * scores (`none` is [[hasChild]] — filter context). Returns the
    * matching parents with a `_score` column, unsorted (rank/page with
    * the usual Bm25/Paging machinery). One partial+final hash aggregate
    * over the filtered children keyed by the parent key, then ONE inner
    * join — the same exchange profile as the count-bounded [[hasChild]],
    * co-bucketable the same way. `avg` divides sum by count once per
    * parent (one rounding step, the weightedAvg discipline).
    */
  def hasChildScored(parents: DataFrame, children: DataFrame,
      parentKey: String, childKey: String, childFilter: Column,
      childScore: Column, scoreMode: String = "sum"): DataFrame = {
    val folded = scoreMode match {
      case "sum" => sum(childScore)
      case "min" => min(childScore)
      case "max" => max(childScore)
      case "avg" => sum(childScore) / count(lit(1)).cast("double")
      case other => throw new IllegalArgumentException(
        s"has_child: score_mode must be sum|min|max|avg (none = hasChild), got <$other>")
    }
    val scored = children.where(childFilter)
      .groupBy(col(childKey).as("_pk")).agg(folded.as("_score"))
    parents.join(scored, parents(parentKey) === scored("_pk"))
      .drop("_pk")
  }

  /** ES `has_parent` — CHILD docs whose parent matches `parentFilter`.
    * ONE left-semi join of children against the filtered parents'
    * keys; the filtered side is the small one by construction (a
    * selective parent predicate), so AQE broadcasts it and the children
    * scan never shuffles. Filter context only (ES's default
    * `score: false`; the score mode copies the parent's score onto every
    * child — compose [[graft.query.Bm25]] output through an ordinary
    * join if needed).
    */
  def hasParent(parents: DataFrame, children: DataFrame,
      parentKey: String, childKey: String, parentFilter: Column): DataFrame = {
    val pk = parents.where(parentFilter).select(col(parentKey).as("_pk"))
    children.join(pk, children(childKey) === pk("_pk"), "left_semi")
  }

  /** ES `parent_id` — children of ONE named parent. A literal pushed-down
    * filter (shows up in the scan's PushedFilters; with the children
    * bucketed or partitioned on the key it prunes to one bucket) — listed
    * as a method so every ES join-field query type has its counterpart,
    * not because it needs machinery.
    */
  def parentId(children: DataFrame, childKey: String, id: Column): DataFrame =
    children.where(col(childKey) === id)

  /** ES `children` aggregation — parent buckets stepping DOWN to child
    * metrics: bucket parents by `parentBucket`, count the children under
    * each bucket and fold caller metrics over them. ONE projected join
    * (parent key + bucket dim against the children) and ONE hash
    * aggregate; the join keys on the parent key (co-bucketed layout →
    * exchange-free), the aggregate is partial map-side.
    */
  def childrenAgg(parents: DataFrame, children: DataFrame,
      parentKey: String, childKey: String, parentBucket: String,
      metrics: Seq[Column] = Seq.empty): DataFrame = {
    val p = parents.select(col(parentKey).as("_pk"), col(parentBucket).as("key"))
    children.join(p, col(childKey) === col("_pk"))
      .groupBy("key")
      .agg(count(lit(1)).as("doc_count"), metrics: _*)
  }

  /** ES `parent` aggregation — child buckets stepping UP to parent doc
    * counts: bucket children by `childBucket`, count child docs and
    * DISTINCT parents per bucket (the `parent` agg's doc_count is
    * parents, not children — the join-field twin of
    * [[NestedDocs.nestedAgg]]'s reverse_nested pair). One projected join + one
    * two-phase aggregate (partial distinct on (bucket, parent) then the
    * final count), no second join.
    */
  def parentAgg(parents: DataFrame, children: DataFrame,
      parentKey: String, childKey: String, childBucket: String): DataFrame = {
    val p = parents.select(col(parentKey).as("_pk"))
    children.select(col(childBucket).as("key"), col(childKey))
      .join(p, col(childKey) === col("_pk"), "left_semi")
      .groupBy("key")
      .agg(count(lit(1)).as("doc_count"),
        countDistinct(col(childKey)).as("parent_count"))
  }
}
