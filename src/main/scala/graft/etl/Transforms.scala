package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, TimestampType, DoubleType}

/** Reusable column transforms for harmonization pipelines, restating the
  * per-city notebook derivations (SURVEY.md §2.2, P5-P12) as composable
  * `Column` functions. Everything here is built-in-function algebra —
  * codegen-friendly, no UDFs.
  */
object Transforms {

  /** `M/D/YYYY` date-part extraction (reference `Baltimore-notebook.ipynb:626-635`). */
  private val mdyRegex = """(\d+)/(\d+)/(\d+)"""
  def mdyMonth(c: Column): Column = regexp_extract(c, mdyRegex, 1)
  def mdyDay(c: Column): Column = regexp_extract(c, mdyRegex, 2)
  def mdyYear(c: Column): Column = regexp_extract(c, mdyRegex, 3)

  /** Time parts from either `HH:MM:SS` or packed `HHMM` forms, combined via
    * concat — a cell matches exactly one of the two regexes so the other
    * contributes an empty string (reference `Baltimore-notebook.ipynb:636-649`).
    */
  private val hmsRegex = """(\d+):(\d+):(\d+)"""
  private val packedRegex = """^(\d\d)(\d\d)$"""
  def timeHour(c: Column): Column =
    concat(regexp_extract(c, hmsRegex, 1), regexp_extract(c, packedRegex, 1))
  def timeMinute(c: Column): Column =
    concat(regexp_extract(c, hmsRegex, 2), regexp_extract(c, packedRegex, 2))

  /** Hour `24` → `00` (reference `Baltimore-notebook.ipynb:640`). */
  def normalizeHour24(c: Column): Column = regexp_replace(c, "^24$", "00")

  /** 12h + AM/PM → 24h string hour (reference `LosAngeles-notebook.ipynb:695-699`). */
  def to24Hour(hour12: Column, ampm: Column): Column =
    when(ampm === "PM" && hour12.cast(IntegerType) =!= 12,
      (hour12.cast(IntegerType) + 12).cast("string"))
      .when(ampm === "AM" && hour12.cast(IntegerType) === 12, lit("0"))
      .otherwise(hour12)

  /** Zero-pad an integral string to two digits (reference `Detroit-notebook.ipynb:688`). */
  def zeroPad2(c: Column): Column = format_string("%02d", c.cast(IntegerType))

  /** Assemble a timestamp from string parts:
    * `concat_ws('-', y, m, d) ' ' concat_ws(':', h, mi, '00')` then cast
    * (reference `Baltimore-notebook.ipynb:652`).
    */
  def assembleDatetime(y: Column, m: Column, d: Column, h: Column, mi: Column): Column =
    concat(concat_ws("-", y, m, d), lit(" "), concat_ws(":", h, mi, lit("00")))
      .cast(TimestampType)

  /** `date_format(ts, "EEEE")` — English day name, e.g. "Monday"
    * (reference `Baltimore-notebook.ipynb:663`).
    */
  def dayOfWeekName(ts: Column): Column = date_format(ts, "EEEE")

  /** Strip parens/whitespace from `"(lat, lon)"` coordinate strings
    * (reference `Baltimore-notebook.ipynb:574`).
    */
  def stripGeoParens(c: Column): Column = regexp_replace(c, """[\(\)\s]""", "")

  /** Assemble `"lat,lon"` geolocation string (reference `Detroit-notebook.ipynb:654`). */
  def geolocation(lat: Column, lon: Column): Column = concat(lat, lit(","), lon)

  /** Parse a `"lat,lon"` string into typed components for geo operators. */
  def geoLat(geoloc: Column): Column = split(geoloc, ",").getItem(0).cast(DoubleType)
  def geoLon(geoloc: Column): Column = split(geoloc, ",").getItem(1).cast(DoubleType)

  /** Drop rows whose `column` is null/empty (reference `Baltimore-notebook.ipynb:599`). */
  def nonEmpty(df: DataFrame, column: String): DataFrame =
    df.where(length(col(column)) > 0)

  /** Coordinate sanity bounds — sentinel `99999` values and hemisphere sign
    * conventions (reference `Detroit-notebook.ipynb:630-634`,
    * `LosAngeles-notebook.ipynb:622-627`). Comparison is on an explicit
    * double cast: the reference compares string columns to int literals and
    * relies on Spark's implicit coercion.
    */
  def validCoords(df: DataFrame, latCol: String, lonCol: String): DataFrame =
    df.where(
      col(latCol).cast(DoubleType) > 0 &&
      col(latCol).cast(DoubleType) < 99999 &&
      col(lonCol).cast(DoubleType) < 0 &&
      col(lonCol).cast(DoubleType) > -99999)

  // -------------------------------------------------------------------
  // ANSI-lenient variants for the city recipes. The reference notebooks ran
  // Spark 2.2, where `cast('junk' as int)` yields NULL; Spark 4 defaults
  // `spark.sql.ansi.enabled=true`, where the same cast throws. These restate
  // the reference's lenient-cast semantics as guarded casts that stay inside
  // whole-stage codegen (`when`/`rlike`/`try_to_timestamp`, no UDFs) and are
  // mirrored exactly by `TRY_CAST`/`CASE` in the DuckDB oracle SQL.
  // -------------------------------------------------------------------

  /** Lenient string→int: digits (with optional sign) cast, else NULL. */
  def intOrNull(c: Column): Column =
    when(c.rlike("^-?\\d+$"), c.cast(IntegerType))

  /** Lenient string→double: plain decimal forms cast, else NULL. */
  def doubleOrNull(c: Column): Column =
    when(c.rlike("^-?\\d+(\\.\\d+)?$"), c.cast(DoubleType))

  /** [[assembleDatetime]] with NULL (not error) on malformed input — the
    * Spark 2 cast behavior the notebooks rely on. A row with a missing
    * hour/minute assembles the DATE ONLY and so lands on midnight: the
    * reference's `concat_ws` skips NULL parts and Spark 2's cast accepted the
    * partial string (`Baltimore-notebook.ipynb:652`); emitting the bare date
    * reproduces that midnight without relying on engine-specific partial
    * timestamp parses (DuckDB rejects `'2017-1-7 00'` but accepts
    * `'2017-1-7'`, so the oracle SQL mirrors this branch exactly).
    */
  def assembleDatetimeLenient(y: Column, m: Column, d: Column, h: Column, mi: Column): Column = {
    val hasTime = length(coalesce(h, lit(""))) > 0 && length(coalesce(mi, lit(""))) > 0
    try_to_timestamp(concat(
      concat_ws("-", y, m, d),
      when(hasTime, concat(lit(" "), concat_ws(":", h, mi, lit("00")))).otherwise(lit(""))))
  }

  /** [[castDateParts]] with lenient int casts (empty parts → NULL). */
  def castDatePartsLenient(df: DataFrame, parts: Seq[String] = Seq("year", "month", "day", "hour", "minute")): DataFrame =
    parts.foldLeft(df)((d, c) => d.withColumn(c, intOrNull(col(c))))

  /** [[zeroPad2]] that yields NULL (not `"null"`) on a non-numeric input. */
  def zeroPad2Lenient(c: Column): Column =
    when(intOrNull(c).isNotNull, format_string("%02d", intOrNull(c)))

  /** [[to24Hour]] over lenient int parsing. Deliberate deviation: the
    * reference adds 12 to EVERY PM hour and then maps 24→00
    * (`LosAngeles-notebook.ipynb:695-699`), which sends noon (12 PM) to
    * midnight and leaves midnight (12 AM) at noon; this is the correct
    * conversion, documented as a fixed reference bug (SURVEY.md §7.4).
    */
  def to24HourLenient(hour12: Column, ampm: Column): Column =
    when(ampm === "PM" && intOrNull(hour12) =!= 12,
      (intOrNull(hour12) + 12).cast("string"))
      .when(ampm === "AM" && intOrNull(hour12) === 12, lit("0"))
      .otherwise(hour12)

  /** Constant descriptor columns stamped on every row
    * (reference `Baltimore-notebook.ipynb:548,683-695`).
    */
  def addDatasetDescriptors(
      df: DataFrame,
      city: String,
      rawDataPath: String,
      harmonizedDataPath: String,
      notebookHtml: String): DataFrame =
    df.withColumn("city", lit(city))
      .withColumn("rawdatapath", lit(rawDataPath))
      .withColumn("harmonizeddatapath", lit(harmonizedDataPath))
      .withColumn("notebookhtml", lit(notebookHtml))

  /** Cast the canonical date-part columns to int
    * (reference `Baltimore-notebook.ipynb:658-660`).
    */
  def castDateParts(df: DataFrame, parts: Seq[String] = Seq("year", "month", "day", "hour", "minute")): DataFrame =
    parts.foldLeft(df)((d, c) => d.withColumn(c, col(c).cast(IntegerType)))
}
