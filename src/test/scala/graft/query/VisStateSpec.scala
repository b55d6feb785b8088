package graft.query

import graft.{SparkEntry, SparkSpecBase}
import graft.query.VisState.{BucketAgg, Viz}
import org.apache.spark.sql.functions._

/** The dashboard is DATA: its five panels parse from the reference's own
  * Kibana export (`notebooks/kibana-content/
  * kibana-exported-visualizations.json`, vendored as a resource) instead of
  * five hard-coded calls — change the saved object, change the dashboard.
  */
class VisStateSpec extends SparkSpecBase {

  test("bundled export parses to the dashboard's five panels in panel order") {
    val panels = VisState.bundledDashboard()
    assert(panels.map(_.id) ===
      Seq("IncidentMap", "DatasetTable", "City", "Description", "Day-slash-Hour"))

    val byId = panels.map(p => p.id -> p).toMap
    assert(byId("Description").vizType === "pie")
    assert(byId("Description").buckets === Seq(BucketAgg("terms", "description", 10, 0, false)))
    assert(byId("City").buckets === Seq(BucketAgg("terms", "city", 10, 0, false)))
    assert(byId("Day-slash-Hour").buckets === Seq(
      BucketAgg("terms", "dayofweek", 10, 0, false),
      BucketAgg("terms", "hour", 24, 0, false)))
    assert(byId("DatasetTable").vizType === "table")
    assert(byId("DatasetTable").buckets === Seq(
      BucketAgg("terms", "city", 20, 0, false),
      BucketAgg("terms", "notebookhtml", 20, 0, false)))
    assert(byId("IncidentMap").buckets ===
      Seq(BucketAgg("geohash_grid", "geolocation", 0, 2, true)))
  }

  test("unsupported metric or bucket agg fails loudly") {
    intercept[IllegalArgumentException] {
      VisState.parseVisState("x",
        """{"title":"x","type":"pie","aggs":[{"id":"1","type":"avg","schema":"metric","params":{"field":"y"}}]}""")
    }
    intercept[IllegalArgumentException] {
      VisState.parseVisState("x",
        """{"title":"x","type":"histogram","aggs":[
          |{"id":"1","type":"count","schema":"metric","params":{}},
          |{"id":"2","type":"date_histogram","schema":"segment","params":{"field":"t"}}]}""".stripMargin)
    }
  }

  test("renderViz: a mutated visState changes the dashboard through the same path") {
    import spark.implicits._
    val f = Seq(
      ("Assault", "Baltimore", 1), ("Assault", "Baltimore", 2),
      ("Theft", "Detroit", 3), ("Arson", "Detroit", 4), ("Rape", "LosAngeles", 5)
    ).toDF("description", "city", "hour")

    val saved = VisState.parseVisState("Description",
      """{"title":"Description","type":"pie","aggs":[
        |{"id":"1","type":"count","schema":"metric","params":{}},
        |{"id":"2","type":"terms","schema":"segment",
        | "params":{"field":"description","size":10,"order":"desc","orderBy":"1"}}]}""".stripMargin)
    val full = SparkEntry.renderViz(f, saved).collect()
    assert(full.length === 4)
    assert(full.forall(_.getString(0) === "description_pie"))

    // the analyst edits the saved object: size 10 -> 1
    val mutated = saved.copy(buckets = saved.buckets.map(_.copy(size = 1)))
    val top1 = SparkEntry.renderViz(f, mutated).collect()
    assert(top1.length === 1)
    assert(top1.head.getString(1) === "Assault")

    // ... or re-points it at another field
    val repointed = saved.copy(buckets = saved.buckets.map(_.copy(field = "city")))
    assert(SparkEntry.renderViz(f, repointed).collect().map(_.getString(1)).sorted
      === Array("Baltimore", "Detroit", "LosAngeles"))
  }

  test("renderViz drops bucket fields the engine's projection does not carry") {
    import spark.implicits._
    val f = Seq(("Baltimore", 1), ("Detroit", 2)).toDF("city", "hour")
    val table = VisState.parseVisState("DatasetTable",
      """{"title":"DatasetTable","type":"table","aggs":[
        |{"id":"1","type":"count","schema":"metric","params":{}},
        |{"id":"2","type":"terms","schema":"bucket","params":{"field":"city","size":20,"order":"desc","orderBy":"1"}},
        |{"id":"3","type":"terms","schema":"bucket","params":{"field":"notebookhtml","size":20,"order":"desc","orderBy":"1"}}]}""".stripMargin)
    val rows = SparkEntry.renderViz(f, table).collect()
    // notebookhtml is absent -> the panel degrades to its first level
    assert(rows.map(r => (r.getString(1), r.getLong(3))).sorted
      === Array(("Baltimore", 1L), ("Detroit", 1L)))
    assert(rows.forall(_.getString(2) === ""))
  }

  test("renderViz: a map panel over a frame missing its geo field renders nothing") {
    import spark.implicits._
    // previously exempted from the missing-field check: a saved map whose
    // field the serving frame lacks threw at render instead of degrading
    val f = Seq(("Baltimore", 1), ("Detroit", 2)).toDF("city", "hour")
    val map = VisState.parseVisState("IncidentMap",
      """{"title":"IncidentMap","type":"tile_map","aggs":[
        |{"id":"1","type":"count","schema":"metric","params":{}},
        |{"id":"2","type":"geohash_grid","schema":"segment",
        | "params":{"field":"geolocation","precision":4}}]}""".stripMargin)
    val rows = SparkEntry.renderViz(f, map)
    assert(rows.columns.toSeq === Seq("viz", "key", "subkey", "count"))
    assert(rows.count() === 0)
  }
}
