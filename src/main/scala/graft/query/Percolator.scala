package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ES percolator — search REVERSED: queries are stored as data and each
  * incoming document reports which stored queries it matches (the
  * machinery under Kibana alerting/Watcher: "tell me when a document
  * like THIS arrives"). The dictionary-driven philosophy the reference's
  * webapp is built on (widgets-from-data, `collections.js`) taken to its
  * endpoint: with [[QueryString.parse]], the stored queries themselves
  * are user-authored STRINGS, compiled at plan time.
  *
  * Spark-first shape: ONE corpus scan; every stored query compiles to a
  * boolean `Column` evaluated row-locally inside whole-stage codegen (no
  * per-query pass, no join against a query table — the query set is
  * plan-side, exactly where ES's percolator holds its candidate-pruned
  * query set per segment). `|queries|` bounded by plan size — thousands
  * are fine; index-scale millions would shard the query set into several
  * plans, each still one scan.
  *
  * Streaming is the same plan over a streaming frame: percolating each
  * micro-batch IS the alerting tier (PercolatorSpec drives it through
  * MemoryStream).
  */
object Percolator {

  /** A stored query: stable id + compiled predicate. */
  final case class StoredQuery(id: String, spec: FilterSpec)

  /** Parse stored query STRINGS (the at-rest representation a real
    * deployment keeps in a table) into [[StoredQuery]]s.
    */
  def fromStrings(
      queries: Seq[(String, String)],
      defaultField: String): Seq[StoredQuery] =
    queries.map { case (id, q) =>
      StoredQuery(id, QueryString.parse(q, defaultField))
    }

  /** Compile the AT-REST stored-query table — the alerting deployment
    * shape: queries are ROWS a UI or API writes (`(id, query_string)`),
    * read and compiled at percolation-plan build time. The collect is
    * bounded by design — the stored-query set is plan-side (see class
    * doc) — and the bound is ENFORCED: `maxQueries` caps the driver-side
    * collect (default 100k, the sharding guidance's ceiling — ~100 shards
    * of 1024 through [[percolateSharded]]), so an unbounded registry
    * table fails loudly instead of silently OOMing the driver.
    */
  def storedFromTable(
      table: DataFrame, idCol: String, queryCol: String,
      defaultField: String, maxQueries: Int = 100000): Seq[StoredQuery] = {
    require(maxQueries >= 1,
      s"storedFromTable: maxQueries must be >= 1, got $maxQueries")
    // limit(max+1): one row past the bound is enough to detect overflow
    // without ever collecting the full oversized registry.
    val rows = table
      .select(col(idCol).cast("string"), col(queryCol).cast("string"))
      .limit(maxQueries + 1)
      .collect()
    require(rows.length <= maxQueries,
      s"storedFromTable: stored-query table exceeds maxQueries=$maxQueries — " +
        "stored queries are plan-side (driver-compiled); partition the " +
        "registry and percolate each partition via percolateSharded, or " +
        "raise maxQueries deliberately")
    fromStrings(rows.toSeq.map(r => (r.getString(0), r.getString(1))), defaultField)
  }

  /** Wide form: the input rows with a `matched_queries` array column
    * (stored-query ids, in registration order; empty when none match —
    * every document keeps its row, the filter is the caller's choice).
    * Null predicate results count as non-matching, the [[FilterSpec.Not]]
    * three-valued-logic discipline.
    */
  def percolate(docs: DataFrame, queries: Seq[StoredQuery]): DataFrame = {
    require(queries.nonEmpty, "percolate: no stored queries")
    require(queries.map(_.id).distinct.size == queries.size,
      "percolate: duplicate stored-query ids")
    val flags = queries.map(q =>
      when(coalesce(q.spec.compile, lit(false)), lit(q.id)))
    docs.withColumn("matched_queries",
      filter(array(flags: _*), x => x.isNotNull))
  }

  /** Long form: one `(queryId, <doc columns...>)` row per match — the
    * alert stream shape.
    */
  def percolateLong(
      docs: DataFrame, idCol: String, queries: Seq[StoredQuery]): DataFrame =
    percolate(docs, queries)
      .select(explode(col("matched_queries")).as("query_id"), col(s"`$idCol`"))
      .select(col("query_id"), col(s"`$idCol`"))

  /** Index-scale percolation: the stored-query set sharded into plans of
    * at most `maxQueriesPerPlan`, each shard ONE codegen'd corpus scan,
    * results unioned (the long form — union of wide forms would multiply
    * doc rows). This is the documented answer to the single-plan bound:
    * one plan carries thousands of compiled predicates comfortably, but
    * ten-thousand `when` columns overflow whole-stage codegen's method
    * budget and fall back to interpreted evaluation — sharding keeps
    * every shard inside codegen at the cost of `⌈n/max⌉` scans (ES pays
    * the same shape per segment). Shard boundaries are invisible in the
    * result: exact parity with [[percolateLong]] over the full set.
    */
  def percolateSharded(
      docs: DataFrame, idCol: String, queries: Seq[StoredQuery],
      maxQueriesPerPlan: Int = 1024): DataFrame = {
    require(maxQueriesPerPlan >= 1,
      s"percolateSharded: maxQueriesPerPlan must be >= 1, got $maxQueriesPerPlan")
    require(queries.nonEmpty, "percolate: no stored queries")
    require(queries.map(_.id).distinct.size == queries.size,
      "percolate: duplicate stored-query ids")
    queries.grouped(maxQueriesPerPlan)
      .map(shard => percolateLong(docs, idCol, shard))
      .reduce(_.unionByName(_))
  }
}
