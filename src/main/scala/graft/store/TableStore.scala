package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet-backed table persistence and DDL generation — the reference's
  * storage seam (`harmonizeCrimeIncidents.py:408-440`, SURVEY.md §2.1 S3-S6):
  * `saveAsTable` into a `.../table=<name>` path, `SHOW CREATE TABLE` rewritten
  * to external-catalog (Athena-style) DDL. The Athena JDBC execution itself is
  * out of scope offline; DDL strings are returned for any external catalog.
  */
object TableStore {

  /** S4 — schema (database) lifecycle (`Baltimore-notebook.ipynb:897-899`). */
  def recreateDatabase(spark: SparkSession, db: String): Unit = {
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
    spark.sql(s"CREATE DATABASE `$db`")
  }

  /** S3 — persist as a Parquet-backed table at an explicit
    * `<basePath>/table=<table>` location (a *naming convention* in the
    * reference, not a partition column — `harmonizeCrimeIncidents.py:410-415`)
    * and return external-catalog DDL for it.
    *
    * `partitionBy` is our scale extension: the reference writes unpartitioned
    * tables; partitioning by e.g. `city`/`year` makes Catalyst partition
    * pruning available to every dictionary-driven filter.
    */
  def saveAsParquetTable(
      df: DataFrame,
      db: String,
      table: String,
      basePath: String,
      partitionBy: Seq[String] = Seq.empty): String = {
    val path = s"$basePath/table=$table"
    val writer = df.write.format("parquet").mode("overwrite").option("path", path)
    val partitioned = if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer
    partitioned.saveAsTable(s"`$db`.`$table`")
    externalTableDdl(df.sparkSession, db, table)
  }

  /** S5 — `SHOW CREATE TABLE` rewritten to external-table dialect
    * (`harmonizeCrimeIncidents.py:417-421`): CREATE TABLE → CREATE EXTERNAL
    * TABLE, `USING parquet` → `STORED AS PARQUET`, keep the LOCATION.
    */
  def externalTableDdl(spark: SparkSession, db: String, table: String): String = {
    val raw = spark.sql(s"SHOW CREATE TABLE `$db`.`$table`")
      .collect().head.getString(0)
    raw
      .replaceFirst("(?i)CREATE TABLE", "CREATE EXTERNAL TABLE")
      .replaceFirst("(?i)USING parquet", "STORED AS PARQUET")
  }

  /** Convenience: the dictionary is tiny (one row per column) — write it as a
    * single file like the reference's `coalesce(1)`
    * (`harmonizeCrimeIncidents.py:405`).
    */
  def saveDictionary(dict: DataFrame, db: String, table: String, basePath: String): String =
    saveAsParquetTable(dict.coalesce(1), db, table, basePath)

  /** Scale extension: persist bucketed (and sorted) by a join key. Two
    * tables bucketed the same way join with NO exchange on either side —
    * the co-located-join layout for keys queried repeatedly at 100 TB
    * (e.g. a document table and its per-document feature table bucketed by
    * doc id). Bucketed tables require `saveAsTable` (the bucket metadata
    * lives in the catalog, not the parquet files).
    */
  def saveAsBucketedTable(
      df: DataFrame,
      db: String,
      table: String,
      bucketBy: Seq[String],
      numBuckets: Int,
      sortBy: Seq[String] = Seq.empty): Unit = {
    require(bucketBy.nonEmpty, "bucketBy must name at least one column")
    // A managed table's warehouse directory can outlive the metastore that
    // registered it (an in-memory catalog is per-JVM; the filesystem isn't).
    // When the catalog has no such table but its default location exists,
    // saveAsTable refuses (LOCATION_ALREADY_EXISTS) instead of overwriting —
    // clear the orphan location first. A table the CURRENT catalog knows is
    // left alone: mode("overwrite") replaces it through the normal path.
    val spark = df.sparkSession
    if (!spark.catalog.tableExists(s"`$db`.`$table`")) {
      val loc = new org.apache.hadoop.fs.Path(
        spark.sessionState.catalog.defaultTablePath(
          org.apache.spark.sql.catalyst.TableIdentifier(table, Some(db))))
      val fs = FsOps.fileSystem(spark, loc.toString)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
    val w = df.write.format("parquet").mode("overwrite")
      .bucketBy(numBuckets, bucketBy.head, bucketBy.tail: _*)
    val sorted = if (sortBy.nonEmpty) w.sortBy(sortBy.head, sortBy.tail: _*) else w
    sorted.saveAsTable(s"`$db`.`$table`")
  }
}
