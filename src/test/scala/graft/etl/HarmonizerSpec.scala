package graft.etl

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** P1-P4: mapVar / mapValues / makeValidVariableNames / setIntColumns
  * (reference `harmonizeCrimeIncidents.py:246-329`).
  */
class HarmonizerSpec extends SparkSpecBase {
  import spark.implicits._

  private def base = Seq(
    ("I1", "HOMICIDE", "2017"),
    ("I2", "ROBBERY", "2016"),
  ).toDF("Incident ID", "Desc", "Year")

  test("mapVar renames with lineage and drops the original") {
    val h = Harmonizer(base).mapVar("Desc", "description")
    assert(h.df.columns.toSeq === Seq("Incident ID", "Year", "description"))
    assert(h.varMap === Map("description" -> "Desc"))
  }

  test("mapVar keepOrig preserves the source column") {
    val h = Harmonizer(base).mapVar("Desc", "description", keepOrig = true)
    assert(h.df.columns.contains("Desc") && h.df.columns.contains("description"))
  }

  test("mapVar same-name keepOrig snapshots <name>_orig") {
    val h = Harmonizer(base).mapVar("Desc", "Desc", keepOrig = true)
    assert(h.df.columns.contains("Desc_orig"))
    assert(h.df.select("Desc_orig").as[String].collect().sorted === Array("HOMICIDE", "ROBBERY"))
  }

  test("mapValues recodes listed values and passes others through (ELSE branch)") {
    val h = Harmonizer(base).mapValues("Desc", Seq("HOMICIDE" -> "Homicide"))
    assert(h.df.select("Desc").as[String].collect().sorted === Array("Homicide", "ROBBERY"))
    assert(h.transformDescrs("Desc").nonEmpty)
  }

  test("mapValues handles values with embedded quotes (reference SQL-injection fragility not ported)") {
    val df = Seq("it's a 'test'").toDF("c")
    val h = Harmonizer(df).mapValues("c", Seq("it's a 'test'" -> "ok"))
    assert(h.df.select("c").as[String].head() === "ok")
  }

  test("mapValues resolves the column case-insensitively and renames to the requested casing") {
    // LA recodes 'description' against a column created as 'Description'
    // (`LosAngeles-notebook.ipynb:668`); the recode must resolve it and the
    // output column takes the requested (lowercase) name.
    val df = Seq("ARSON", "OTHER").toDF("Description")
    val h = Harmonizer(df).mapValues("description", Seq("ARSON" -> "Arson"))
    assert(h.df.columns.toSeq === Seq("description"))
    assert(h.df.select("description").as[String].collect().sorted === Array("Arson", "OTHER"))
  }

  test("makeValidVariableNames strips invalid chars, lowercases, records lineage") {
    val h = Harmonizer(base).makeValidVariableNames
    assert(h.df.columns.toSeq === Seq("incidentid", "desc", "year"))
    assert(h.varMap === Map("incidentid" -> "Incident ID", "desc" -> "Desc", "year" -> "Year"))
  }

  test("makeValidVariableNames fails fast on post-sanitization collisions") {
    val df = Seq((1, 2)).toDF("Event Type", "eventtype")
    val e = intercept[IllegalArgumentException](Harmonizer(df).makeValidVariableNames)
    assert(e.getMessage.contains("collide"))
  }

  test("setIntColumns casts boolean-coded strings to int") {
    val df = Seq(("1", "x"), ("0", "y")).toDF("gang_related", "other")
    val h = Harmonizer(df).setIntColumns(Seq("gang_related"))
    assert(h.df.schema("gang_related").dataType.typeName === "integer")
    assert(h.df.select("gang_related").as[Int].collect().sorted === Array(0, 1))
  }
}
