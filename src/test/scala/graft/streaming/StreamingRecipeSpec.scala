package graft.streaming

import graft.SparkSpecBase
import graft.etl.{CityRecipes, Recipe}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Harmonization recipes over Structured Streaming: every [[Recipe]] step is
  * a stateless projection/filter, so the SAME recipe instance that batch-runs
  * a city's portal CSV also harmonizes a live feed of raw rows — `readStream`
  * in, identical column transforms, no recipe changes. (The reference's ETL
  * is batch-only; this is the engine's ingest-while-serving parity point.)
  * The counted Loaded/Deleted report is deliberately batch-only — a stream
  * has no final count.
  */
class StreamingRecipeSpec extends SparkSpecBase {
  import spark.implicits._

  test("the Baltimore recipe harmonizes a stream exactly like the batch run") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String, String, String, String)]
    val raw = mem.toDF().toDF(
      "CrimeDate", "CrimeTime", "CrimeCode", "Description", "Location 1")

    // pre + coordFilter + post compose over a streaming frame unchanged
    val recipe = CityRecipes.baltimore
    val harmonized = recipe.post(recipe.coordFilter(recipe.pre(raw))).df
      .select("crimecode", "description", "year", "month", "day", "hour",
        "minute", "dayofweek", "geolocation")

    val q = harmonized.writeStream
      .format("memory").queryName("recipe_stream")
      .outputMode(OutputMode.Append())
      .start()
    try {
      mem.addData(
        ("9/2/2017", "1851", "1A", "HOMICIDE", "(39.29, -76.61)"),
        ("1/15/2016", "2400", "2A", "AGG. ASSAULT", "(39.30, -76.59)"),
        ("3/5/2017", "08:30:00", "3A", "ARSON", ""))  // empty geo → dropped
      q.processAllAvailable()
      val rows = spark.table("recipe_stream")
        .orderBy("crimecode")
        .as[(String, String, Int, Int, Int, Int, Int, String, String)]
        .collect().toSeq
      assert(rows === Seq(
        ("1A", "Homicide", 2017, 9, 2, 18, 51, "Saturday", "39.29,-76.61"),
        ("2A", "Assault", 2016, 1, 15, 0, 0, "Friday", "39.30,-76.59")))

      // batch twin over identical rows agrees column-for-column
      val batchRaw = Seq(
        ("9/2/2017", "1851", "1A", "HOMICIDE", "(39.29, -76.61)"),
        ("1/15/2016", "2400", "2A", "AGG. ASSAULT", "(39.30, -76.59)"),
        ("3/5/2017", "08:30:00", "3A", "ARSON", ""),
      ).toDF("CrimeDate", "CrimeTime", "CrimeCode", "Description", "Location 1")
      val batch = recipe.harmonize(batchRaw).df
        .select("crimecode", "description", "year", "month", "day", "hour",
          "minute", "dayofweek", "geolocation")
        .orderBy("crimecode")
        .as[(String, String, Int, Int, Int, Int, Int, String, String)]
        .collect().toSeq
      assert(batch === rows)
    } finally q.stop()
  }

  test("a generic Recipe streams too (steps are engine-agnostic column algebra)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String)]
    val raw = mem.toDF().toDF("Event Type", "Some Value")
    val recipe = Recipe(Seq(
      Recipe.Rename("Event Type", "description"),
      Recipe.Recode("description", Seq("click" -> "Click")),
      Recipe.SanitizeNames))
    val q = recipe(raw).df.writeStream
      .format("memory").queryName("generic_recipe_stream")
      .outputMode(OutputMode.Append())
      .start()
    try {
      mem.addData(("click", "1"), ("view", "2"))
      q.processAllAvailable()
      val out = spark.table("generic_recipe_stream")
        .select("description", "somevalue")
        .as[(String, String)].collect().toSet
      assert(out === Set(("Click", "1"), ("view", "2")))
    } finally q.stop()
  }
}
