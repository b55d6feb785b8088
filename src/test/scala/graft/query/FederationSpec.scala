package graft.query

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** G9: wildcard index patterns → unionByName with null-filled missing columns. */
class FederationSpec extends SparkSpecBase {
  import spark.implicits._

  private def fed = Federation(
    "baltimore_harmonized" -> Seq(("b1", "Theft", 2016)).toDF("id", "description", "year"),
    "detroit_harmonized" -> Seq(("d1", "Assault")).toDF("id", "description"),
    "baltimore_dictionary" -> Seq(("description", 100L)).toDF("dict_field", "dict_count"),
  )

  test("wildcard resolution matches ES index-pattern semantics") {
    assert(fed.resolve("*harmonized*") === Seq("baltimore_harmonized", "detroit_harmonized"))
    assert(fed.resolve("*dictionary*") === Seq("baltimore_dictionary"))
    assert(fed.resolve("*") === Seq("baltimore_dictionary", "baltimore_harmonized", "detroit_harmonized"))
    assert(fed.resolve("baltimore_harmonized") === Seq("baltimore_harmonized"))
  }

  test("view unions by name, null-filling missing columns") {
    val v = fed.view("*harmonized*")
    assert(v.count() === 2)
    val detroitYear = v.where(col("id") === "d1").select("year").collect().head
    assert(detroitYear.isNullAt(0))
  }

  test("view on a non-matching pattern fails fast") {
    intercept[IllegalArgumentException](fed.view("*nope*"))
  }

  test("aggregation over the federated view sees all members") {
    val counts = fed.view("*harmonized*").groupBy("description").count()
      .as[(String, Long)].collect().toSet
    assert(counts === Set(("Theft", 1L), ("Assault", 1L)))
  }

  test("materialize pins the view in the columnar cache and is idempotent") {
    val name = "fedspec_serving"
    try {
      val warm = fed.materialize(spark, "*harmonized*", name)
      assert(spark.catalog.isCached(name))
      assert(warm.count() === 2)
      // identical results to the cold view
      assert(warm.select("id").as[String].collect().sorted.toSeq ===
        fed.view("*harmonized*").select("id").as[String].collect().sorted.toSeq)
      // second call reuses the existing (warm) entry — same plan, still cached
      fed.materialize(spark, "*harmonized*", name)
      assert(spark.catalog.isCached(name))
    } finally {
      spark.catalog.uncacheTable(name)
      spark.catalog.dropTempView(name)
    }
  }
}
