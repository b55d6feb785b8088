package graft.etl

import graft.SparkSpecBase
import graft.etl.Recipe._

/** A whole city harmonization as declarative config — must reproduce the
  * hand-written pipeline from GoldenEndToEndSpec step for step.
  */
class RecipeSpec extends SparkSpecBase {
  import spark.implicits._

  test("a Baltimore-shaped recipe reproduces the hand-written pipeline") {
    val raw = Seq(
      ("9/2/2017", "18:51:00", "HOMICIDE", "(39.29, -76.61)"),
      ("9/2/2017", "1851", "SHOOTING", "(39.28, -76.60)"),
      ("1/15/2016", "2400", "ROBBERY", "(39.30, -76.59)"),
    ).toDF("CrimeDate", "CrimeTime", "Description", "Location 1")

    val recipe = Recipe(Seq(
      Rename("Description", "description"),
      Recode("description", Seq(
        "HOMICIDE" -> "Homicide", "SHOOTING" -> "Shooting", "ROBBERY" -> "Robbery")),
      DeriveDatetime("CrimeDate", "CrimeTime"),
      DeriveGeoFromParen("Location 1"),
      Descriptors("baltimore", "raw.csv", "harm", "none"),
      DropColumns(Seq("CrimeDate", "CrimeTime", "Location 1")),
      SanitizeNames,
    ))
    val h = recipe(raw)

    val rows = h.df.select("description", "year", "month", "day", "hour", "minute", "geolocation")
      .orderBy("year")
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5), r.getString(6)))
    assert(rows.toSeq === Seq(
      ("Robbery", 2016, 1, 15, 0, 0, "39.30,-76.59"),
      ("Homicide", 2017, 9, 2, 18, 51, "39.29,-76.61"),
      ("Shooting", 2017, 9, 2, 18, 51, "39.28,-76.60")))
    // lineage survives the declarative path
    assert(h.varMap("description") === "Description")
  }

  test("a Detroit-shaped recipe with lat/lon columns and coordinate cleaning") {
    val raw = Seq(
      ("Assault", "42.33", "-83.04"),
      ("Theft", "99999", "-83.00"),   // sentinel → dropped
      ("Arson", "42.30", "99999"),    // wrong-sign lon → dropped
    ).toDF("Offense Description", "Latitude", "Longitude")

    val recipe = Recipe(Seq(
      Rename("Offense Description", "description"),
      CleanCoords("Latitude", "Longitude"),
      DeriveGeoFromLatLon("Latitude", "Longitude"),
      DropColumns(Seq("Latitude", "Longitude")),
      SanitizeNames,
    ))
    val out = recipe(raw).df
    assert(out.count() === 1)
    assert(out.select("geolocation").as[String].head() === "42.33,-83.04")
  }

  test("an LA-shaped recipe with boolean recode and int cast") {
    val raw = Seq(("Y", "x"), ("N", "y")).toDF("GANG_RELATED", "other")
    val recipe = Recipe(Seq(
      Recode("GANG_RELATED", Seq("Y" -> "1", "N" -> "0")),
      IntColumns(Seq("GANG_RELATED")),
      SanitizeNames,
    ))
    val out = recipe(raw).df
    assert(out.schema("gang_related").dataType.typeName === "integer")
    assert(out.select("gang_related").as[Int].collect().sorted.toSeq === Seq(0, 1))
  }
}
