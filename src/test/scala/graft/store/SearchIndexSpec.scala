package graft.store

import graft.SparkSpecBase
import graft.expr.TextMatch
import org.apache.spark.sql.functions._

/** The dual-field at-rest index: analyzed companions agree with the
  * on-the-fly analyzer, and indexed queries return identical results.
  */
class SearchIndexSpec extends SparkSpecBase {
  import spark.implicits._

  private def docs = Seq(
    (1L, "Small Widget Assembly"),
    (2L, "widget small"),
    (3L, "smallish widget"),
    (4L, "UNRELATED item"),
  ).toDF("id", "name")

  test("withAnalyzedColumns adds _split companions for string columns") {
    val idx = SearchIndex.withAnalyzedColumns(docs)
    assert(idx.columns.toSeq === Seq("id", "name", "name_split"))
    assert(idx.where(col("id") === 1).select("name_split").as[String].head()
      === " small widget assembly ")
  }

  test("indexed phrase-prefix equals the on-the-fly predicate") {
    val idx = SearchIndex.withAnalyzedColumns(docs)
    for (q <- Seq("small wid", "widget", "smallish w", "", "nope")) {
      val onTheFly = docs.where(TextMatch.phrasePrefix(col("name"), q))
        .select("id").as[Long].collect().toSet
      val indexed = idx.where(SearchIndex.phrasePrefixIndexed(col("name_split"), q))
        .select("id").as[Long].collect().toSet
      assert(indexed === onTheFly, s"query '$q'")
    }
  }

  test("indexed token match requires whole tokens") {
    val idx = SearchIndex.withAnalyzedColumns(docs)
    assert(idx.where(SearchIndex.containsTokenIndexed(col("name_split"), "small"))
      .select("id").as[Long].collect().toSet === Set(1L, 2L))
  }

  test("saveAsSearchIndex persists analyzed companions queryable from parquet") {
    val dir = java.nio.file.Files.createTempDirectory("graft_searchindex").toFile
    dir.deleteOnExit()
    TableStore.recreateDatabase(spark, "graft_si")
    SearchIndex.saveAsSearchIndex(docs, "graft_si", "docs", dir.getAbsolutePath,
      analyzeColumns = Seq("name"))
    val back = spark.table("graft_si.docs")
    assert(back.columns.contains("name_split"))
    assert(back.where(SearchIndex.phrasePrefixIndexed(col("name_split"), "small wid"))
      .count() === 1)
  }
}
