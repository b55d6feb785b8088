package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative harmonization recipes.
  *
  * The reference harmonizes each city in a hand-written notebook — the same
  * rename/recode/derive/clean steps re-coded three times with different
  * constants (`notebooks/{Baltimore,Detroit,LosAngeles}-notebook.ipynb`).
  * A recipe captures those constants as DATA, so onboarding dataset number
  * four is a config change, not new code — and the engine can validate,
  * diff, and persist the recipe alongside the dictionary it produces.
  *
  * Each case class mirrors one notebook pattern (SURVEY.md §2.2-2.3);
  * [[Recipe.apply]] folds them through the lineage-tracking [[Harmonizer]]
  * in declaration order, so `dict_varmapping` reflects recipe provenance.
  */
final case class Recipe(steps: Seq[Recipe.Step]) {

  /** Run the recipe over a raw (all-strings) frame. */
  def apply(df: DataFrame): Harmonizer =
    steps.foldLeft(Harmonizer(df))((h, s) => s(h))
}

object Recipe {

  sealed trait Step { def apply(h: Harmonizer): Harmonizer }

  /** P1 — rename with lineage. */
  final case class Rename(from: String, to: String, keepOrig: Boolean = false) extends Step {
    def apply(h: Harmonizer): Harmonizer = h.mapVar(from, to, keepOrig)
  }

  /** P3 — value recoding (unmapped values pass through). */
  final case class Recode(column: String, mapping: Seq[(String, String)]) extends Step {
    def apply(h: Harmonizer): Harmonizer = h.mapValues(column, mapping)
  }

  /** P6/P8/P12 — datetime parts from an `M/D/YYYY` date column and a time
    * column accepting both `HH:MM:SS` and packed `HHMM` (the Baltimore dual
    * format), hour `24` normalized, assembled into `datetime`, parts cast
    * to int, plus the derived `dayofweek` name.
    */
  final case class DeriveDatetime(dateCol: String, timeCol: String) extends Step {
    def apply(h: Harmonizer): Harmonizer = h.transform { df =>
      val t = df
        .withColumn("month", Transforms.mdyMonth(col(dateCol)))
        .withColumn("day", Transforms.mdyDay(col(dateCol)))
        .withColumn("year", Transforms.mdyYear(col(dateCol)))
        .withColumn("hour", Transforms.normalizeHour24(Transforms.timeHour(col(timeCol))))
        .withColumn("minute", Transforms.timeMinute(col(timeCol)))
        .withColumn("datetime", Transforms.assembleDatetime(
          col("year"), col("month"), col("day"), col("hour"), col("minute")))
        .withColumn("dayofweek", Transforms.dayOfWeekName(col("datetime")))
      Transforms.castDateParts(t)
    }
  }

  /** P7/P8 — `"(lat, lon)"` string → cleaned `geolocation` = `"lat,lon"`. */
  final case class DeriveGeoFromParen(col_ : String) extends Step {
    def apply(h: Harmonizer): Harmonizer = h.transform(
      _.withColumn("geolocation", Transforms.stripGeoParens(col(col_))))
  }

  /** P8 — `geolocation` from separate lat/lon columns. */
  final case class DeriveGeoFromLatLon(latCol: String, lonCol: String) extends Step {
    def apply(h: Harmonizer): Harmonizer = h.transform(
      _.withColumn("geolocation", Transforms.geolocation(col(latCol), col(lonCol))))
  }

  /** F2 — drop rows with sentinel/invalid coordinates. */
  final case class CleanCoords(latCol: String, lonCol: String) extends Step {
    def apply(h: Harmonizer): Harmonizer =
      h.transform(Transforms.validCoords(_, latCol, lonCol))
  }

  /** F1 — drop rows with a null/empty column. */
  final case class RequireNonEmpty(column: String) extends Step {
    def apply(h: Harmonizer): Harmonizer = h.transform(Transforms.nonEmpty(_, column))
  }

  /** P5 — dataset descriptor constants. */
  final case class Descriptors(city: String, rawDataPath: String,
      harmonizedDataPath: String, notebookHtml: String) extends Step {
    def apply(h: Harmonizer): Harmonizer = h.transform(
      Transforms.addDatasetDescriptors(_, city, rawDataPath, harmonizedDataPath, notebookHtml))
  }

  /** P4 — int casts for boolean-coded columns. */
  final case class IntColumns(columns: Seq[String]) extends Step {
    def apply(h: Harmonizer): Harmonizer = h.setIntColumns(columns)
  }

  /** Drop raw/temporary columns. */
  final case class DropColumns(columns: Seq[String]) extends Step {
    def apply(h: Harmonizer): Harmonizer =
      h.transform(df => df.drop(columns: _*))
  }

  /** P2 — final name sanitization (always last: it fails fast on
    * post-sanitization collisions).
    */
  case object SanitizeNames extends Step {
    def apply(h: Harmonizer): Harmonizer = h.makeValidVariableNames
  }
}
