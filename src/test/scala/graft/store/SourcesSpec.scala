package graft.store

import graft.SparkSpecBase
import org.apache.spark.sql.types.StringType

/** S1 (SURVEY §2.1): headered CSV scan with NO schema inference — every
  * column arrives as a string, the reference's deliberate ingestion contract
  * ("all variables initially typed as strings",
  * `Baltimore-notebook.ipynb:266-274`); types are imposed later by
  * harmonization.
  */
class SourcesSpec extends SparkSpecBase {
  import spark.implicits._

  test("headered CSV reads all-strings and round-trips values") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv_spec").toFile
    dir.deleteOnExit()
    val path = dir.getAbsolutePath + "/raw.csv"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
      """CrimeDate,CrimeTime,Latitude,Longitude
        |9/2/2017,18:51:00,39.29,-76.61
        |9/2/2017,1851,,
        |""".stripMargin)

    val df = spark.read
      .option("header", "true")
      .option("inferSchema", "false")
      .csv(path)

    // every column is a string — no inference
    assert(df.schema.fields.forall(_.dataType == StringType))
    assert(df.columns.toSeq === Seq("CrimeDate", "CrimeTime", "Latitude", "Longitude"))
    val rows = df.orderBy("CrimeTime").collect()
    assert(rows.length === 2)
    assert(rows(1).getString(1) === "18:51:00")
    assert(rows(0).getString(1) === "1851")   // packed time stays a string
    assert(rows(0).isNullAt(2))               // empty cell → null, not 0.0
  }

  test("S2 ingest: streams an HTTP source into the raw zone, staged then promoted") {
    // A real HTTP fetch with no egress: the JDK's HttpServer serves the
    // portal CSV on localhost, exactly the shape of the reference's
    // curl → s3 cp notebook cell.
    val csv = "CrimeDate,Description\n9/2/2017,HOMICIDE\n12/31/2016,ROBBERY\n"
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/portal/rows.csv", (ex: com.sun.net.httpserver.HttpExchange) => {
      val bytes = csv.getBytes("UTF-8")
      ex.sendResponseHeaders(200, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    val dir = java.nio.file.Files.createTempDirectory("graft_ingest_spec").toFile
    dir.deleteOnExit()
    val target = dir.getAbsolutePath + "/raw/baltimore.csv"
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/portal/rows.csv"
      val n = Sources.fetchToRaw(spark, url, target)
      assert(n === csv.getBytes("UTF-8").length.toLong)
      // no staging debris; the landed object is byte-identical
      assert(!new java.io.File(target + "._ingesting").exists())
      assert(java.nio.file.Files.readString(java.nio.file.Paths.get(target)) === csv)
      // and the landed file feeds the S1 all-strings scan directly
      val df = Sources.csvAllStrings(spark, target)
      assert(df.count() === 2)
      assert(df.schema.fields.forall(_.dataType == StringType))
    } finally server.stop(0)
  }

  test("S2 ingest refuses non-200 responses instead of landing the stub body") {
    // The http→https portal redirect case: HttpURLConnection hands back the
    // 301 body as readable bytes — it must never be promoted as data.
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/rows.csv", (ex: com.sun.net.httpserver.HttpExchange) => {
      ex.getResponseHeaders.add("Location", "https://moved.example/rows.csv")
      val body = "<html>Moved</html>".getBytes("UTF-8")
      ex.sendResponseHeaders(301, body.length)
      ex.getResponseBody.write(body)
      ex.close()
    })
    server.start()
    val dir = java.nio.file.Files.createTempDirectory("graft_ingest_301").toFile
    dir.deleteOnExit()
    val target = dir.getAbsolutePath + "/raw.csv"
    try {
      val e = intercept[java.io.IOException] {
        Sources.fetchToRaw(spark,
          s"http://127.0.0.1:${server.getAddress.getPort}/rows.csv", target)
      }
      assert(e.getMessage.contains("301"))
      assert(!new java.io.File(target).exists(), "redirect stub must not land")
    } finally server.stop(0)
  }

  test("all-strings scan feeds the harmonization pipeline end-to-end") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv_spec2").toFile
    dir.deleteOnExit()
    val path = dir.getAbsolutePath + "/raw.csv"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
      """Incident ID,Description,CrimeDate
        |I1,HOMICIDE,9/2/2017
        |I2,ROBBERY,12/31/2016
        |""".stripMargin)
    val raw = spark.read.option("header", "true").option("inferSchema", "false").csv(path)

    import graft.etl.{Harmonizer, Transforms}
    import org.apache.spark.sql.functions._
    val h = Harmonizer(raw)
      .mapVar("Description", "description")
      .mapValues("description", Seq("HOMICIDE" -> "Homicide", "ROBBERY" -> "Robbery"))
      .transform(df => Transforms.castDateParts(
        df.withColumn("year", Transforms.mdyYear(col("CrimeDate"))), Seq("year")))
      .makeValidVariableNames
    val out = h.df.select("incidentid", "description", "year")
      .as[(String, String, Int)].collect().toSet
    assert(out === Set(("I1", "Homicide", 2017), ("I2", "Robbery", 2016)))
  }
}
