package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Federated ("index pattern") views over loosely coupled datasets.
  *
  * The reference queries all city indexes at once through Elasticsearch
  * wildcard index patterns — `*harmonized*` / `*dictionary*`
  * (`services/webapp/src/config.js:16,22`) — with fields absent from one
  * dataset simply absent per document. The Spark-native equivalent is a
  * catalog of named DataFrames unioned by column name with missing columns
  * null-filled.
  */
final case class Federation(datasets: Map[String, DataFrame]) {

  def add(name: String, df: DataFrame): Federation = copy(datasets + (name -> df))

  /** All dataset names matching an ES-style wildcard pattern (`*` only). */
  def resolve(pattern: String): Seq[String] = {
    val regex = ("^" + pattern.split("\\*", -1).map(java.util.regex.Pattern.quote).mkString(".*") + "$").r
    datasets.keys.toSeq.sorted.filter(n => regex.findFirstIn(n).isDefined)
  }

  /** The federated view for a wildcard pattern: `unionByName` with
    * `allowMissingColumns` — a column missing from one dataset reads as null
    * there, matching ES's absent-field semantics (SURVEY.md §2.1 G9).
    *
    * This is a pure plan-level union: filters and projections applied on top
    * still push down into each member's scan independently (Catalyst
    * distributes them through `Union`), so a federated query at 100 TB reads
    * only the matching partitions/columns of each member table.
    */
  def view(pattern: String): DataFrame = {
    val names = resolve(pattern)
    require(names.nonEmpty, s"no datasets match pattern '$pattern'")
    names.map(datasets(_)).reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** §3.3 warm serving path: the federated view pinned in Spark's in-memory
    * columnar cache under temp view `viewName`.
    *
    * The reference serves every dashboard interaction (typeahead, widget
    * refresh) from a hot Elasticsearch index — its entire serving half is a
    * memory-resident inverted index (`services/webapp/src/config.js:43-59`).
    * The Spark-native analogue is a long-lived serving session that pins the
    * SERVING PROJECTION — the handful of analyzed/aggregated fields the
    * dashboard touches, not `SELECT *` — as cached columnar batches: the
    * first query populates the cache partition-by-partition, every later
    * query scans memory. At 100 TB the full corpus doesn't fit in cluster
    * RAM, but the serving projection (a few string enum columns, dictionary
    * tables, typeahead fields) is orders of magnitude smaller and does; cache
    * eviction falls back to the parquet scan, never to an error.
    *
    * Idempotent per `viewName`: if the view already exists in this session
    * the existing (already-warm) cache entry is reused — callers can invoke
    * this per request, serving-tier style, and only the first pays the scan.
    */
  def materialize(spark: SparkSession, pattern: String, viewName: String): DataFrame = {
    if (!spark.catalog.tableExists(viewName)) {
      view(pattern).createOrReplaceTempView(viewName)
      spark.catalog.cacheTable(viewName)
    }
    spark.table(viewName)
  }
}

object Federation {
  def apply(entries: (String, DataFrame)*): Federation = Federation(entries.toMap)
}
