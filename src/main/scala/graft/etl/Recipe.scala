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

  /** Continue a recipe from an in-flight harmonizer (keeps lineage). */
  def apply(h: Harmonizer): Harmonizer = steps.foldLeft(h)((acc, s) => s(acc))
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

  /** P6 — `M/D/YYYY` date prefix → string `month`/`day`/`year` columns
    * (reference `Baltimore-notebook.ipynb:626-635`; Detroit extracts the same
    * three groups from its combined date-and-time column,
    * `Detroit-notebook.ipynb:668-676`).
    */
  final case class DeriveMdyDate(dateCol: String) extends Step {
    def apply(h: Harmonizer): Harmonizer = h.transform { df =>
      df.withColumn("month", Transforms.mdyMonth(col(dateCol)))
        .withColumn("day", Transforms.mdyDay(col(dateCol)))
        .withColumn("year", Transforms.mdyYear(col(dateCol)))
    }
  }

  /** P6/P7 — Baltimore's dual-format time column (`HH:MM:SS` or packed
    * `HHMM`) → string `hour`/`minute`, hour `24` normalized to `00`
    * (reference `Baltimore-notebook.ipynb:636-649`).
    */
  final case class DeriveTimeDual(timeCol: String) extends Step {
    def apply(h: Harmonizer): Harmonizer = h.transform { df =>
      df.withColumn("hour", Transforms.normalizeHour24(Transforms.timeHour(col(timeCol))))
        .withColumn("minute", Transforms.timeMinute(col(timeCol)))
    }
  }

  /** P10 — Detroit has only an integer hour-of-day column: zero-pad it to a
    * two-digit `hour` and hardcode `minute` to `00`
    * (reference `Detroit-notebook.ipynb:686-691`).
    */
  final case class DeriveHourMinute(hourCol: String) extends Step {
    def apply(h: Harmonizer): Harmonizer = h.transform { df =>
      df.withColumn("hour", Transforms.zeroPad2Lenient(col(hourCol)))
        .withColumn("minute", lit("00"))
    }
  }

  /** P6/P9 — LA's single `M/D/YYYY h:m:s AM|PM` column → all five string
    * parts, 12h→24h converted (reference `LosAngeles-notebook.ipynb:674-702`;
    * the reference's noon/midnight conversion bug is fixed, see
    * [[Transforms.to24HourLenient]]).
    */
  final case class DeriveAmPmParts(srcCol: String) extends Step {
    private val rx = """(\d+)/(\d+)/(\d+) (\d+):(\d+):(\d+) (\w\w)"""
    def apply(h: Harmonizer): Harmonizer = h.transform { df =>
      val c = col(srcCol)
      df.withColumn("month", regexp_extract(c, rx, 1))
        .withColumn("day", regexp_extract(c, rx, 2))
        .withColumn("year", regexp_extract(c, rx, 3))
        .withColumn("hour",
          Transforms.normalizeHour24(Transforms.to24HourLenient(
            Transforms.normalizeHour24(regexp_extract(c, rx, 4)),
            regexp_extract(c, rx, 7))))
        .withColumn("minute", regexp_extract(c, rx, 5))
    }
  }

  /** P8/P11/P12 — assemble `datetime` from the five string parts, derive
    * `dayofweek`, lenient-cast the parts to int (reference
    * `Baltimore-notebook.ipynb:652-663`). Lenient: empty parts yield NULL
    * datetime/ints, the Spark 2 cast behavior the notebooks ran under.
    */
  case object AssembleDatetime extends Step {
    def apply(h: Harmonizer): Harmonizer = h.transform { df =>
      val asm = df
        .withColumn("datetime", Transforms.assembleDatetimeLenient(
          col("year"), col("month"), col("day"), col("hour"), col("minute")))
        .withColumn("dayofweek", Transforms.dayOfWeekName(col("datetime")))
      Transforms.castDatePartsLenient(asm)
    }
  }

  /** F2 — lenient numeric coordinate bounds: sentinel `99999` values and
    * hemisphere sign conventions (reference `Detroit-notebook.ipynb:630-634`,
    * `LosAngeles-notebook.ipynb:622-627`). NULL/unparseable coordinates fail
    * every bound and are dropped, matching the reference's lenient casts.
    */
  final case class CoordBounds(
      latCol: String, lonCol: String,
      latGt: Option[Double] = None, latLt: Option[Double] = None,
      lonGt: Option[Double] = None, lonLt: Option[Double] = None) extends Step {
    def apply(h: Harmonizer): Harmonizer = h.transform { df =>
      val lat = Transforms.doubleOrNull(col(latCol))
      val lon = Transforms.doubleOrNull(col(lonCol))
      val preds =
        latGt.map(lat > _).toSeq ++ latLt.map(lat < _) ++
        lonGt.map(lon > _) ++ lonLt.map(lon < _)
      preds.foldLeft(df)((d, p) => d.where(p))
    }
  }

  /** P4 — lenient int casts (non-numeric → NULL, the Spark 2 behavior). */
  final case class IntColumnsLenient(columns: Seq[String]) extends Step {
    def apply(h: Harmonizer): Harmonizer = h.transform { df =>
      columns.foldLeft(df)((d, c) => d.withColumn(c, Transforms.intOrNull(col(c))))
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
