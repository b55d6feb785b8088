package graft

import graft.dict.Dictionary
import graft.etl.CityRecipes
import graft.query.{Aggs, Federation, Widgets}
import graft.store.Sources
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's complete lifecycle on its OWN (fixture-shaped) datasets:
  * the three real city recipes harmonize their portal CSV extracts, the
  * results federate under the `*harmonized*` index pattern, each city gets a
  * dictionary, and the serving half — dictionary-driven widgets, typeahead
  * over the warm cache, geohash map — runs against the federated view.
  * This is SURVEY §3.1→§3.3 end to end, with every stage asserted instead of
  * eyeballed.
  */
class CityLifecycleSpec extends SparkSpecBase {
  import spark.implicits._

  private def harmonizedCity(recipe: CityRecipes.CityRecipe): DataFrame =
    recipe.harmonize(
      Sources.csvAllStrings(spark, s"data/cities/${recipe.city}.csv")).df

  private lazy val fed = Federation(
    "baltimore_harmonized" -> harmonizedCity(CityRecipes.baltimore),
    "detroit_harmonized" -> harmonizedCity(CityRecipes.detroit),
    "losangeles_harmonized" -> harmonizedCity(CityRecipes.losAngeles))

  test("the full notebook run: ingest (S2) → harmonize → publish docs (S9)") {
    // The complete per-city notebook, engine-native: fetch the portal CSV
    // into the raw zone over real HTTP, run the counted recipe, publish the
    // run's documentation where the dataset descriptor points.
    val csvBytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("data/cities/Baltimore.csv"))
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/api/views/rows.csv", (ex: com.sun.net.httpserver.HttpExchange) => {
      ex.sendResponseHeaders(200, csvBytes.length)
      ex.getResponseBody.write(csvBytes)
      ex.close()
    })
    server.start()
    val dir = java.nio.file.Files.createTempDirectory("graft_lifecycle").toFile
    dir.deleteOnExit()
    try {
      val raw = dir.getAbsolutePath + "/raw/Baltimore.csv"
      Sources.fetchToRaw(spark,
        s"http://127.0.0.1:${server.getAddress.getPort}/api/views/rows.csv", raw)
      val (h, report) = CityRecipes.baltimore.run(Sources.csvAllStrings(spark, raw))
      assert(report.loaded === 17L && report.deleted === 2L)
      assert(h.df.count() === 15L)
      val docs = dir.getAbsolutePath + "/docs/Baltimore-notebook.html"
      graft.store.RunReport.publishRun(spark, "Baltimore",
        report.loaded, report.deleted, h, docs)
      val html = java.nio.file.Files.readString(java.nio.file.Paths.get(docs))
      assert(html.contains("Loaded 17 rows") && html.contains("<td>crimecode</td>"))
    } finally server.stop(0)
  }

  test("federated view unions the three cities with absent fields null") {
    val v = fed.view("*harmonized*")
    assert(v.count() === 15 + 18 + 16)
    // per-city rows via the descriptor constant
    val byCity = v.groupBy("city").count().as[(String, Long)].collect().toMap
    assert(byCity === Map("Baltimore" -> 15L, "Detroit" -> 18L, "LosAngeles" -> 16L))
    // gang_related exists only in LA — null (not error) elsewhere
    assert(v.where(col("city") === "Baltimore").select("gang_related")
      .collect().forall(_.isNullAt(0)))
  }

  test("the dashboard terms aggregation spans cities on the shared vocabulary") {
    val top = Aggs.termsTopN(fed.view("*harmonized*"), "description", 3)
      .as[(String, Long)].collect().toSeq
    // recode maps share the harmonized vocabulary, so counts accumulate
    // across cities: Miscellaneous dominates via Detroit+LA
    assert(top.head._1 === "Miscellaneous")
    assert(top.map(_._1).toSet.subsetOf(Set(
      "Miscellaneous", "Assault", "Theft", "Homicide", "Robbery", "Burglary")))
  }

  test("per-city dictionaries profile the harmonized output with lineage") {
    val h = CityRecipes.detroit.harmonize(
      Sources.csvAllStrings(spark, "data/cities/Detroit.csv"))
    val dict = Dictionary.profileHarmonized(h)
    val byField = dict.collect().map(r => r.getAs[String]("dict_field") -> r).toMap
    assert(byField("description").getAs[String]("dict_varmapping").contains("Offense Category"))
    assert(byField.contains("geolocation") && byField.contains("datetime"))
    // widgets compile off the dictionary: description renders as an enum/text
    val fields = Widgets.fieldsFromDictionary(dict)
    assert(fields.fields.exists(_.name === "description"))
  }

  test("harmonized city output indexes for analyzed search (the esindex step)") {
    import graft.store.SearchIndex
    // the reference bulk-indexes each harmonized city into ES
    // (esindex.py:116-139); here the analyzed companions ride at rest and
    // phrase-prefix search runs on the indexed form — no second cluster
    val balt = harmonizedCity(CityRecipes.baltimore)
    val indexed = SearchIndex.withAnalyzedColumns(balt, Seq("description", "location"))
    assert(indexed.columns.contains("description_split"))
    // analyzed phrase-prefix over the indexed form finds the recoded enums
    val hits = indexed.where(
        SearchIndex.phrasePrefixIndexed(col("description_split"), "assa"))
      .select("description").distinct().as[String].collect().toSeq
    assert(hits === Seq("Assault"))
    // token match over the multi-word location field
    val street = indexed.where(
        SearchIndex.containsTokenIndexed(col("location_split"), "main"))
      .count()
    assert(street === 15) // every kept Baltimore row is on N MAIN ST
  }

  test("typeahead and geohash map run against the warm federated cache") {
    val name = "city_serving"
    try {
      val warm = fed.materialize(spark, "*harmonized*", name)
      assert(spark.catalog.isCached(name))
      val suggestions = Aggs.typeahead(warm, "description", "assa", size = 5)
        .as[String].collect().toSeq
      assert(suggestions === Seq("Assault"))
      // the map tile query over the at-rest "lat,lon" encoding
      val cells = Aggs.geohashGridFromGeoloc(warm, "geolocation", precision = 2)
        .as[(String, Long)].collect()
      assert(cells.map(_._2).sum === 49) // every kept row has coordinates
      // Baltimore ("dq"), Detroit ("dp"), LA ("9q") each occupy their cell
      assert(cells.map(_._1).toSet === Set("dq", "dp", "9q"))
    } finally {
      spark.catalog.uncacheTable(name)
      spark.catalog.dropTempView(name)
    }
  }
}
