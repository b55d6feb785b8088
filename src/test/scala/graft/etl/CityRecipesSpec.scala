package graft.etl

import graft.SparkSpecBase
import graft.etl.CityRecipes._
import graft.store.Sources
import org.apache.spark.sql.DataFrame

/** The three real city notebooks, run as [[Recipe]] data over the checked-in
  * fixture extracts at `data/cities/<city>.csv` (see `tools/gen_city_fixtures.py`:
  * every recode key from the notebooks appears at least once, plus the edge
  * shapes each notebook's pipeline exercises).
  *
  * Pins both layers of parity:
  *   - the notebook constants themselves (`referenceLoaded`/`referenceDeleted`
  *     = the executed notebooks' "Loaded N / Deleted M" prints,
  *     `notebooks/html/<city>-notebook.html`), and
  *   - the engine's reproduction of the notebooks' reporting SEMANTICS over
  *     the fixtures: loaded = raw count, deleted = rows failing the
  *     coordinate/geo cleaning filter.
  */
class CityRecipesSpec extends SparkSpecBase {

  private def fixture(city: String): DataFrame =
    Sources.csvAllStrings(spark, s"data/cities/$city.csv")

  private def rowsByKey(df: DataFrame, key: String, cols: String*): Map[String, Seq[Any]] =
    df.select(key, cols: _*).collect()
      .map(r => r.getString(0) -> (1 until r.length).map(i => if (r.isNullAt(i)) null else r.get(i)))
      .toMap

  test("reference constants match the executed notebooks' Loaded/Deleted prints") {
    assert(baltimore.referenceLoaded === 243399L && baltimore.referenceDeleted === 410L)
    assert(detroit.referenceLoaded === 96812L && detroit.referenceDeleted === 48406L)
    assert(losAngeles.referenceLoaded === 172860L && losAngeles.referenceDeleted === 11421L)
  }

  test("Baltimore: loaded/deleted report, dual time formats, hour 24, recodes") {
    val (h, report) = baltimore.run(fixture("Baltimore"))
    assert(report === HarmonizeReport(loaded = 17, deleted = 2))
    val out = h.df
    assert(out.count() === 15)

    // sanitized names only; raw date/time columns dropped; descriptors present
    assert(out.columns.forall(c => c.matches("[a-z0-9_]+")))
    assert(!out.columns.contains("crimedate") && !out.columns.contains("crimetime"))
    assert(out.columns.toSet.intersect(Set(
      "city", "rawdatapath", "harmonizeddatapath", "notebookhtml")).size === 4)

    val byCode = rowsByKey(out, "crimecode",
      "description", "description_orig", "year", "month", "day", "hour", "minute",
      "dayofweek", "geolocation")
    // i=1: packed "1851" time, AGG. ASSAULT -> Assault, date 2/2/2016
    assert(byCode("2A") === Seq("Assault", "AGG. ASSAULT", 2016, 2, 2, 18, 51,
      "Tuesday", "39.2100,-76.6900"))
    // i=4: packed "2400" -> hour 24 normalized to 00
    assert(byCode("5A") === Seq("Rape", "RAPE", 2016, 5, 5, 0, 0,
      "Thursday", "39.2400,-76.6600"))
    // i=6: EMPTY time -> null hour/minute but datetime lands on midnight
    //      (the reference's concat_ws-skips-nulls + Spark 2 cast behavior)
    assert(byCode("7A") === Seq("Robbery", "ROBBERY - COMMERCIAL", 2015, 7, 7,
      null, null, "Tuesday", "39.2600,-76.6400"))
    // i=15: unmapped description passes through unchanged
    assert(byCode("16A")(0) === "UNKNOWN")
    // deleted: the two empty-geolocation rows (i=5, i=11)
    assert(!byCode.contains("6A") && !byCode.contains("12A"))
  }

  test("Baltimore: empty-time row assembles a midnight datetime") {
    val (h, _) = baltimore.run(fixture("Baltimore"))
    import org.apache.spark.sql.functions.{col, date_format}
    val dt = h.df.where(col("crimecode") === "7A")
      .select(date_format(col("datetime"), "yyyy-MM-dd HH:mm:ss")).head().getString(0)
    assert(dt === "2015-07-07 00:00:00")
  }

  test("Detroit: 99999 sentinels, hemisphere signs, hour-of-day zero-pad") {
    val (h, report) = detroit.run(fixture("Detroit"))
    assert(report === HarmonizeReport(loaded = 49, deleted = 31))
    val out = h.df
    assert(out.count() === 18)

    // the raw Location column was overwritten by the incident address
    assert(out.columns.count(_ == "location") === 1)
    val byId = rowsByKey(out, "crimeid",
      "description", "location", "year", "month", "day", "hour", "minute",
      "dayofweek", "geolocation")
    // i=0: ABORTION -> Miscellaneous, hour 0 zero-padded, minute hardcoded 00
    assert(byId("1000") === Seq("Miscellaneous", "200 WOODWARD AVE", 2016, 1, 1,
      0, 0, "Friday", "42.331,-83.045"))
    // i=9 (DISORDERLY CONDUCT): coords cycle 0 -> kept; hour 9
    assert(byId("1009") === Seq("Miscellaneous", "209 WOODWARD AVE", 2016, 10, 10,
      9, 0, "Monday", "42.331,-83.045"))
    // every corrupt coordinate shape is gone: empty / 99999 / sign flips
    assert(!byId.contains("1003") && !byId.contains("1004") && !byId.contains("1005"))
    assert(!byId.contains("1006") && !byId.contains("1007") && !byId.contains("1008"))
    // KIDNAPING (the notebook's misspelled key) recodes too: i=23 -> cycle 5 deleted,
    // so check via the recode map directly plus a kept KIDNAPPING row (i=22, cycle 4 deleted).
    assert(detroitDescr.toMap.apply("KIDNAPING") === "Kidnapping")
  }

  test("LosAngeles: AM/PM conversion (noon/midnight fixed), gang_related recode") {
    val (h, report) = losAngeles.run(fixture("LosAngeles"))
    assert(report === HarmonizeReport(loaded = 31, deleted = 15))
    val out = h.df
    assert(out.count() === 16)

    val byId = rowsByKey(out, "crime_identifier",
      "description", "hour", "minute", "gang_related", "dayofweek", "geolocation")
    // i=0: 07:30:00 PM -> 19:30, GANG_RELATED Y -> 1
    assert(byId("9000") === Seq("Assault", 19, 30, 1, "Thursday", "33.9731,-118.2479"))
    // i=1: 11:59:00 PM -> 23:59, N -> 0
    assert(byId("9001") === Seq("Arson", 23, 59, 0, "Monday", "34.0522,-118.2437"))
    // i=2: 12:00:00 PM is NOON -> hour 12 (reference bug sends it to 0 — fixed)
    assert(byId("9002")(1) === 12)
    // i=2: empty GANG_RELATED -> null int
    assert(byId("9002")(3) === null)
    // i=19: 12:30:00 AM is just past MIDNIGHT -> hour 0 (reference leaves it 12 — fixed)
    assert(byId("9019") === Seq("Assault", 0, 30, 0, "Thursday", "34.0522,-118.2437"))
    // raw LOCATION/CITY overwritten by street/constant-free columns; temps dropped
    assert(!out.columns.contains("crime_date") && !out.columns.contains("crime_year"))
  }

  test("full pipelines preserve rename lineage through sanitization") {
    val (h, _) = detroit.run(fixture("Detroit"))
    assert(h.varMap("description") === "Offense Category")
    val (hb, _) = baltimore.run(fixture("Baltimore"))
    assert(hb.varMap("geolocation") === "Location 1")
  }
}
