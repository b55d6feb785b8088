package graft

import graft.dict.Dictionary
import graft.etl.{Harmonizer, Transforms}
import graft.query.{Aggs, Federation, FieldCollection, FilterSpec, Widgets}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Golden end-to-end (SURVEY.md §5 item 4): a miniature city CSV through the
  * full reference pipeline — all-strings scan → harmonize (rename, recode,
  * datetime assembly from BOTH Baltimore time formats, geo cleanup, name
  * sanitization) → dictionary profile → dictionary-driven widgets →
  * federated aggregation — asserted against hand-computed expected output.
  * The reference only ever eyeballed this; here it's pinned.
  */
class GoldenEndToEndSpec extends SparkSpecBase {
  import spark.implicits._

  private def writeCsv(name: String, content: String): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_golden").toFile
    dir.deleteOnExit()
    val p = dir.getAbsolutePath + s"/$name.csv"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(p), content)
    p
  }

  /** Baltimore-shaped fixture: M/D/YYYY dates, both time formats incl. the
    * hour-24 quirk, "(lat, lon)" geo strings with an empty and a sentinel row.
    */
  private lazy val baltimorePath = writeCsv("baltimore",
    """CrimeDate,CrimeTime,Description,Location 1
      |9/2/2017,18:51:00,HOMICIDE,"(39.29, -76.61)"
      |9/2/2017,1851,SHOOTING,"(39.28, -76.60)"
      |1/15/2016,2400,ROBBERY,"(39.30, -76.59)"
      |3/5/2017,08:30:00,HOMICIDE,
      |""".stripMargin)

  private lazy val harmonized: Harmonizer = {
    val raw = spark.read.option("header", "true").option("inferSchema", "false")
      .csv(baltimorePath)
    Harmonizer(raw)
      .mapVar("Description", "description")
      .mapValues("description", Seq(
        "HOMICIDE" -> "Homicide", "SHOOTING" -> "Shooting", "ROBBERY" -> "Robbery"))
      .transform { df =>
        val t = df
          .withColumn("month", Transforms.mdyMonth(col("CrimeDate")))
          .withColumn("day", Transforms.mdyDay(col("CrimeDate")))
          .withColumn("year", Transforms.mdyYear(col("CrimeDate")))
          .withColumn("hour", Transforms.normalizeHour24(Transforms.timeHour(col("CrimeTime"))))
          .withColumn("minute", Transforms.timeMinute(col("CrimeTime")))
          .withColumn("datetime", Transforms.assembleDatetime(
            col("year"), col("month"), col("day"), col("hour"), col("minute")))
          .withColumn("dayofweek", Transforms.dayOfWeekName(col("datetime")))
          .withColumn("geolocation", Transforms.stripGeoParens(col("Location 1")))
          .drop("CrimeDate", "CrimeTime", "Location 1")
        Transforms.castDateParts(
          Transforms.addDatasetDescriptors(t, "baltimore", "raw.csv", "harm", "none"))
      }
      .makeValidVariableNames
  }

  test("harmonized rows match the golden shape and values") {
    val rows = harmonized.df
      .select("description", "year", "month", "day", "hour", "minute", "dayofweek", "geolocation", "city")
      .orderBy("year", "month", "day")
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4),
        r.getInt(5), r.getString(6), r.getString(7), r.getString(8)))
    assert(rows.toSeq === Seq(
      ("Robbery", 2016, 1, 15, 0, 0, "Friday", "39.30,-76.59", "baltimore"),    // hour 24 → 00
      ("Homicide", 2017, 3, 5, 8, 30, "Sunday", null, "baltimore"),             // empty geo → null
      ("Homicide", 2017, 9, 2, 18, 51, "Saturday", "39.29,-76.61", "baltimore"),
      ("Shooting", 2017, 9, 2, 18, 51, "Saturday", "39.28,-76.60", "baltimore"), // packed 1851
    ))
  }

  test("dictionary profile records lineage, stats, and harmonized metadata") {
    val dict = Dictionary.profileHarmonized(harmonized)
    val byField = dict.collect().map(r => r.getAs[String]("dict_field") -> r).toMap
    assert(byField("description").getAs[String]("dict_varmapping").contains("Source Description"))
    assert(byField("description").getAs[Long]("dict_countdistinct") === 3)
    assert(byField("geolocation").getAs[Long]("dict_countmissing") === 1)
    assert(byField("year").getAs[String]("dict_vartype") === "range,2000,2017,1")
    assert(byField("dayofweek").getAs[String]("dict_vartype").startsWith("enum,Monday"))
    // unknown-typed string columns fall through inference to text
    assert(byField("city").getAs[String]("dict_vartype") === "text")
  }

  test("A4 enum builder collects sorted distinct non-empty values") {
    assert(Dictionary.uniqueValues(harmonized.df, "description")
      === Seq("Homicide", "Robbery", "Shooting"))
  }

  test("dictionary-driven widgets compile the webapp's query and display text") {
    val dict = Dictionary.profileHarmonized(harmonized)
    val fields = Widgets.fieldsFromDictionary(dict)
    // identifiers (geolocation) and uifilter=False fields don't render widgets
    assert(!fields.fields.exists(_.name == "geolocation"))
    assert(fields.fields.exists(_.name == "year"))

    val fc: FieldCollection = fields
      .select("year", Widgets.Selection.RangeSel(2017, 2017))
      .select("description", Widgets.Selection.TextSel("homi"))
    val out = harmonized.df.where(fc.compile)
    assert(out.count() === 2)
    // selections render in field order (deterministic under Map iteration)
    assert(fc.displayText === """description:"* homi*" AND year:>=2017 AND year:<=2017""")

    // type mismatch fails fast
    intercept[IllegalArgumentException] {
      fields.select("year", Widgets.Selection.TextSel("x"))
    }
    // empty text selection is a no-op widget (webapp's disabled state)
    val noop = fields.select("description", Widgets.Selection.TextSel("  "))
    assert(noop.spec === FilterSpec.MatchAll)
  }

  test("federated aggregation over two harmonized cities (the dashboard query)") {
    val detroit = Seq(
      ("Homicide", 2017, "detroit"), ("Assault", 2016, "detroit"),
    ).toDF("description", "year", "city")
    val fed = Federation(
      "baltimore_harmonized" -> harmonized.df.select("description", "year", "city"),
      "detroit_harmonized" -> detroit)
    val top = Aggs.termsTopN(fed.view("*harmonized*"), "description", 10)
      .as[(String, Long)].collect().toSeq
    assert(top === Seq(("Homicide", 3L), ("Assault", 1L), ("Robbery", 1L), ("Shooting", 1L)))

    // the dashboard time/range filter ANDs into the federated aggregation
    val spec = FilterSpec.NumericRange("year", 2017, 2017)
    val filtered = Aggs.termsTopN(fed.view("*harmonized*").where(spec.compile), "description", 10)
      .as[(String, Long)].collect().toSeq
    assert(filtered === Seq(("Homicide", 3L), ("Shooting", 1L)))
  }

  test("driver contract: entry returns rows at sf0.001") {
    // The driver smoke-checks exactly this — pin it here so a refactor
    // that breaks the flagship path fails in CI, not at round end.
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
