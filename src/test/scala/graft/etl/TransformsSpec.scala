package graft.etl

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** P5-P12 / F1-F2: the notebook column derivations, including the city
  * edge cases called out in SURVEY.md §5 — both Baltimore time formats,
  * hour 24→00, AM/PM noon/midnight, paren stripping, sentinel coords.
  */
class TransformsSpec extends SparkSpecBase {
  import spark.implicits._

  test("mdy regex extraction") {
    val df = Seq("9/2/2017", "12/31/2016").toDF("d")
      .select(
        Transforms.mdyMonth(col("d")).as("m"),
        Transforms.mdyDay(col("d")).as("dd"),
        Transforms.mdyYear(col("d")).as("y"))
    assert(df.as[(String, String, String)].collect().toSet ===
      Set(("9", "2", "2017"), ("12", "31", "2016")))
  }

  test("time parts from both HH:MM:SS and packed HHMM (Baltimore dual format)") {
    val df = Seq("18:51:00", "1851").toDF("t")
      .select(Transforms.timeHour(col("t")).as("h"), Transforms.timeMinute(col("t")).as("m"))
    assert(df.as[(String, String)].collect().toSet === Set(("18", "51")))
  }

  test("hour 24 normalizes to 00") {
    val df = Seq("24", "23", "2").toDF("h").select(Transforms.normalizeHour24(col("h")).as("h"))
    assert(df.as[String].collect().toSet === Set("00", "23", "2"))
  }

  test("12h AM/PM to 24h, including noon and midnight") {
    val df = Seq(("11", "PM"), ("12", "PM"), ("12", "AM"), ("7", "AM")).toDF("h", "ap")
      .select(Transforms.to24Hour(col("h"), col("ap")).as("h24"))
    assert(df.as[String].collect().toSeq === Seq("23", "12", "0", "7"))
  }

  test("zero padding") {
    val df = Seq("7", "12").toDF("h").select(Transforms.zeroPad2(col("h")).as("p"))
    assert(df.as[String].collect().toSet === Set("07", "12"))
  }

  test("datetime assembly and day-of-week naming") {
    val df = Seq(("2017", "9", "2", "18", "51")).toDF("y", "m", "d", "h", "mi")
      .select(Transforms.assembleDatetime(col("y"), col("m"), col("d"), col("h"), col("mi")).as("dt"))
      .select(col("dt"), Transforms.dayOfWeekName(col("dt")).as("dow"))
    val (dt, dow) = df.as[(java.sql.Timestamp, String)].head()
    assert(dt === ts("2017-09-02 18:51:00"))
    assert(dow === "Saturday")
  }

  test("geo paren stripping and lat/lon round trip") {
    val df = Seq("(39.2, -76.6)").toDF("g")
      .select(Transforms.stripGeoParens(col("g")).as("g"))
      .select(col("g"), Transforms.geoLat(col("g")).as("lat"), Transforms.geoLon(col("g")).as("lon"))
    val (g, lat, lon) = df.as[(String, Double, Double)].head()
    assert(g === "39.2,-76.6" && lat === 39.2 && lon === -76.6)
  }

  test("validCoords drops sentinel 99999 and wrong-hemisphere rows (Detroit rules)") {
    val df = Seq(
      ("42.3", "-83.0"),   // valid
      ("99999", "-83.0"),  // sentinel lat
      ("42.3", "99999"),   // sentinel + wrong sign lon
      ("-1", "-83.0"),     // non-positive lat
    ).toDF("lat", "lon")
    assert(Transforms.validCoords(df, "lat", "lon").count() === 1)
  }

  test("nonEmpty drops null and empty strings") {
    val df = Seq(Some("x"), Some(""), None).toDF("c")
    assert(Transforms.nonEmpty(df, "c").count() === 1)
  }

  test("dataset descriptors stamp constants") {
    val df = Transforms.addDatasetDescriptors(Seq(1).toDF("i"), "baltimore", "raw", "harm", "html")
    assert(df.columns.toSet === Set("i", "city", "rawdatapath", "harmonizeddatapath", "notebookhtml"))
    assert(df.select("city").as[String].head() === "baltimore")
  }
}
