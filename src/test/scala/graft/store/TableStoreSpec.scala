package graft.store

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** S3-S5: parquet table sink, database lifecycle, external DDL rewrite. */
class TableStoreSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmpDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_store_spec").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  test("saveAsParquetTable writes at <base>/table=<name>, registers, returns external DDL") {
    val base = tmpDir
    TableStore.recreateDatabase(spark, "graft_test")
    val df = Seq(("b1", "Theft", 2016), ("b2", "Assault", 2017)).toDF("id", "description", "year")
    val ddl = TableStore.saveAsParquetTable(df, "graft_test", "incidents", base)

    // data lands at the conventional path and reads back
    val back = spark.read.parquet(s"$base/table=incidents")
    assert(back.count() === 2)
    // catalog registration works
    assert(spark.sql("SELECT count(*) FROM graft_test.incidents").as[Long].head() === 2)
    // DDL is external-table dialect with the location preserved
    assert(ddl.contains("CREATE EXTERNAL TABLE"))
    assert(!ddl.matches("(?s).*CREATE TABLE .*"))
    assert(ddl.toLowerCase.contains("location") || ddl.contains(base))
  }

  test("partitioned save produces partition directories (scale extension)") {
    val base = tmpDir
    TableStore.recreateDatabase(spark, "graft_test2")
    val df = Seq(("b1", "baltimore"), ("d1", "detroit")).toDF("id", "city")
    TableStore.saveAsParquetTable(df, "graft_test2", "inc", base, partitionBy = Seq("city"))
    val dirs = new java.io.File(s"$base/table=inc").listFiles().map(_.getName).filter(_.startsWith("city="))
    assert(dirs.toSet === Set("city=baltimore", "city=detroit"))
  }

  test("saveDictionary writes a single parquet file (coalesce(1) like the reference)") {
    val base = tmpDir
    TableStore.recreateDatabase(spark, "graft_test3")
    val dict = (1 to 50).map(i => (s"f$i", i.toLong)).toDF("dict_field", "dict_count")
      .repartition(4)
    TableStore.saveDictionary(dict, "graft_test3", "dict", base)
    val parts = new java.io.File(s"$base/table=dict").listFiles()
      .map(_.getName).count(n => n.startsWith("part-"))
    assert(parts === 1)
  }
}
