package graft.etl

import org.apache.spark.sql.DataFrame

/** The reference's three city harmonization notebooks, encoded as
  * [[Recipe]] data — the demonstrated-parity milestone (SURVEY.md §2.2-2.3).
  *
  * Every constant below is lifted from the notebook source:
  *   - Baltimore  `notebooks/Baltimore-notebook.ipynb`  (recode map cells
  *     500-526; dual time formats + hour 24 cells 626-660)
  *   - Detroit    `notebooks/Detroit-notebook.ipynb`    (recode map cells
  *     466-516; 99999 sentinels + hemisphere signs cells 630-634)
  *   - LosAngeles `notebooks/LosAngeles-notebook.ipynb` (recode map cells
  *     468-501; AM/PM datetime cells 674-702; gang_related boolean cell 828)
  *
  * The executed notebooks pin the live-portal row counts
  * (`notebooks/html/<city>-notebook.html`): Baltimore loaded 243,399 / deleted
  * 410; Detroit 96,812 / 48,406; LosAngeles 172,860 / 11,421 — recorded on
  * each [[CityRecipe]] and asserted in RecipeSpec. The engine's own counted
  * run ([[CityRecipe.run]]) reproduces the notebooks' "Loaded N / Deleted M"
  * reporting semantics over the checked-in fixture extracts at
  * `data/cities/<city>.csv`.
  *
  * Reference quirks preserved (they shape the output schema):
  *   - `withColumn` overwrite-renames: Detroit's raw `Location` column is
  *     overwritten by the incident address (`Detroit-notebook.ipynb:577`),
  *     LA's raw `LOCATION` by `STREET` and raw `CITY` by the city constant;
  *     Baltimore's raw `Year` is overwritten by the extracted year.
  *   - Detroit's `df.drop('incidentdate')` is a no-op (the real column is
  *     the sanitized date-and-time name), so the raw datetime string column
  *     survives into the harmonized output — kept here.
  * Documented deviations (SURVEY.md §7.4): name sanitization also strips
  * `&`/`#` (reference keeps them, `harmonizeCrimeIncidents.py:325`), the LA
  * noon/midnight AM/PM bug is fixed ([[Transforms.to24HourLenient]]), and
  * casts are ANSI-lenient guards matching the reference's Spark 2 behavior.
  */
object CityRecipes {
  import Recipe._

  /** One city notebook: pipeline stages split around the counted coordinate
    * filter so [[run]] can reproduce the notebook's "Deleted N rows" print.
    */
  final case class CityRecipe(
      city: String,
      pre: Recipe,
      coordFilter: Recipe,
      post: Recipe,
      referenceLoaded: Long,
      referenceDeleted: Long) {

    /** The full pipeline, uncounted — the shape registered in SparkEntry. */
    def harmonize(raw: DataFrame): Harmonizer = post(coordFilter(pre(raw)))

    /** Counted run mirroring the notebook's Loaded/Deleted reporting
      * (`Baltimore-notebook.ipynb` cells 10 and 22). Triggers two extra
      * count jobs — use [[harmonize]] when the report isn't needed.
      */
    def run(raw: DataFrame): (Harmonizer, HarmonizeReport) = {
      val loaded = raw.count()
      val before = pre(raw)
      val kept = coordFilter(before)
      val deleted = loaded - kept.df.count()
      (post(kept), HarmonizeReport(loaded, deleted))
    }
  }

  final case class HarmonizeReport(loaded: Long, deleted: Long)

  private def descriptors(city: String, notebook: String): Descriptors =
    Descriptors(
      city = city,
      rawDataPath = s"s3://scratch-bucket/crimedata/raw/$city.csv",
      harmonizedDataPath = s"s3://scratch-bucket/crimedata/harmonized/$city",
      notebookHtml =
        s"https://s3.amazonaws.com/scratch-bucket/crimedata/harmonized/$city/docs/$notebook.html")

  /** Baltimore recode map, `Baltimore-notebook.ipynb:500-526`. */
  val baltimoreDescr: Seq[(String, String)] = Seq(
    "ARSON" -> "Arson",
    "AGG. ASSAULT" -> "Assault",
    "ASSAULT BY THREAT" -> "Assault",
    "COMMON ASSAULT" -> "Assault",
    "RAPE" -> "Rape",
    "BURGLARY" -> "Burglary",
    "ROBBERY - COMMERCIAL" -> "Robbery",
    "ROBBERY - RESIDENCE" -> "Robbery",
    "ROBBERY - STREET" -> "Robbery",
    "ROBBERY - CARJACKING" -> "Robbery",
    "LARCENY FROM AUTO" -> "Theft",
    "AUTO THEFT" -> "Theft",
    "LARCENY" -> "Theft",
    "HOMICIDE" -> "Homicide",
    "SHOOTING" -> "Weapons")

  val baltimore: CityRecipe = CityRecipe(
    city = "Baltimore",
    pre = Recipe(Seq(
      Rename("Description", "description_orig", keepOrig = true),
      Rename("Location 1", "geolocation"),
      SanitizeNames,
      Recode("description", baltimoreDescr),
      DeriveGeoFromParen("geolocation"))),
    coordFilter = Recipe(Seq(
      RequireNonEmpty("geolocation"))),
    post = Recipe(Seq(
      DeriveMdyDate("crimedate"),
      DeriveTimeDual("crimetime"),
      AssembleDatetime,
      DropColumns(Seq("crimedate", "crimetime")),
      descriptors("Baltimore", "Baltimore-notebook"))),
    referenceLoaded = 243399L,
    referenceDeleted = 410L)

  /** Detroit recode map, `Detroit-notebook.ipynb:466-516`. */
  val detroitDescr: Seq[(String, String)] = Seq(
    "ABORTION" -> "Miscellaneous",
    "AGGRAVATED ASSAULT" -> "Assault",
    "ARSON" -> "Arson",
    "ASSAULT" -> "Assault",
    "BRIBERY" -> "Bribery",
    "BURGLARY" -> "Burglary",
    "CIVIL" -> "Miscellaneous",
    "DAMAGE TO PROPERTY" -> "Miscellaneous",
    "DANGEROUS DRUGS" -> "Narcotics",
    "DISORDERLY CONDUCT" -> "Miscellaneous",
    "DRUNKENNESS" -> "OUI",
    "EMBEZZLEMENT" -> "Embezzlement",
    "ENVIRONMENT" -> "Miscellaneous",
    "ESCAPE" -> "Miscellaneous",
    "EXTORTION" -> "Miscellaneous",
    "FAMILY OFFENSE" -> "Miscellaneous",
    "FORGERY" -> "Miscellaneous",
    "FRAUD" -> "Fraud",
    "GAMBLING" -> "Miscellaneous",
    "HOMICIDE" -> "Homicide",
    "IMMIGRATION" -> "Miscellaneous",
    "JUSTIFIABLE HOMICIDE" -> "Homicide",
    "KIDNAPPING" -> "Kidnapping",
    "KIDNAPING" -> "Kidnapping",
    "LARCENY" -> "Theft",
    "LIQUOR" -> "Miscellaneous",
    "MILITARY" -> "Miscellaneous",
    "MISCELLANEOUS" -> "Miscellaneous",
    "MISCELLANEOUS ARREST" -> "Miscellaneous",
    "MURDER/INFORMATION" -> "Homicide",
    "NEGLIGENT HOMICIDE" -> "Homicide",
    "OBSCENITY" -> "Miscellaneous",
    "OBSTRUCTING JUDICIARY" -> "Miscellaneous",
    "OBSTRUCTING THE POLICE" -> "Miscellaneous",
    "OTHER" -> "Miscellaneous",
    "OTHER BURGLARY" -> "Burglary",
    "OUIL" -> "OUI",
    "ROBBERY" -> "Robbery",
    "RUNAWAY" -> "Miscellaneous",
    "SOLICITATION" -> "Miscellaneous",
    "STOLEN PROPERTY" -> "Theft",
    "STOLEN VEHICLE" -> "Vehicle Theft",
    "SEXUAL ASSAULT" -> "Sex Offenses",
    "SEX OFFENSES" -> "Sex Offenses",
    "TRAFFIC" -> "Miscellaneous",
    "TRAFFIC OFFENSES" -> "Miscellaneous",
    "VAGRANCY (OTHER)" -> "Miscellaneous",
    "WEAPONS OFFENSES" -> "Weapons")

  val detroit: CityRecipe = CityRecipe(
    city = "Detroit",
    pre = Recipe(Seq(
      Rename("Incident Address", "location"), // overwrites raw `Location`
      Rename("Offense Category", "description", keepOrig = true),
      SanitizeNames,
      Recode("description", detroitDescr))),
    coordFilter = Recipe(Seq(
      RequireNonEmpty("latitude"),
      RequireNonEmpty("longitude"),
      // `Detroit-notebook.ipynb:630-634`: lat in (0, 99999), lon < 0 (the
      // notebook's `longitude < 99999` is subsumed by `longitude < 0`).
      CoordBounds("latitude", "longitude",
        latGt = Some(0), latLt = Some(99999), lonLt = Some(0)))),
    post = Recipe(Seq(
      DeriveGeoFromLatLon("latitude", "longitude"),
      DropColumns(Seq("latitude", "longitude")),
      DeriveMdyDate("incidentdatetime"),
      DeriveHourMinute("hourofday"),
      AssembleDatetime,
      // the notebook's drop('incidentdate') is a no-op; the raw
      // date-and-time string column stays in the output (see scaladoc)
      descriptors("Detroit", "Detroit-notebook"))),
    referenceLoaded = 96812L,
    referenceDeleted = 48406L)

  /** LosAngeles recode map, `LosAngeles-notebook.ipynb:468-501`. */
  val losAngelesDescr: Seq[(String, String)] = Seq(
    "AGGRAVATED ASSAULT" -> "Assault",
    "ARSON" -> "Arson",
    "BURGLARY" -> "Burglary",
    "CRIMINAL HOMICIDE" -> "Homicide",
    "DISORDERLY CONDUCT" -> "Miscellaneous",
    "DRUNK / ALCOHOL / DRUGS" -> "OUI",
    "DRUNK DRIVING VEHICLE / BOAT" -> "OUI",
    "FEDERAL OFFENSES W/O MONEY" -> "Miscellaneous",
    "FEDERAL OFFENSES WITH MONEY" -> "Miscellaneous",
    "FELONIES MISCELLANEOUS" -> "Miscellaneous",
    "FORCIBLE RAPE" -> "Rape",
    "FORGERY" -> "Miscellaneous",
    "FRAUD AND NSF CHECKS" -> "Fraud",
    "GAMBLING" -> "Miscellaneous",
    "GRAND THEFT AUTO" -> "Vehicle Theft",
    "LARCENY THEFT" -> "Theft",
    "LIQUOR LAWS" -> "Miscellaneous",
    "MISDEMEANORS MISCELLANEOUS" -> "Miscellaneous",
    "NARCOTICS" -> "Narcotics",
    "NON-AGGRAVATED ASSAULTS" -> "Assault",
    "OFFENSES AGAINST FAMILY" -> "Miscellaneous",
    "RECEIVING STOLEN PROPERTY" -> "Miscellaneous",
    "ROBBERY" -> "Robbery",
    "SEX OFFENSES FELONIES" -> "Sex Offenses",
    "SEX OFFENSES MISDEMEANORS" -> "Sex Offenses",
    "VAGRANCY" -> "Miscellaneous",
    "VANDALISM" -> "Miscellaneous",
    "VEHICLE / BOATING LAWS" -> "Miscellaneous",
    "WARRANTS" -> "Miscellaneous",
    "WEAPON LAWS" -> "Weapons")

  val losAngeles: CityRecipe = CityRecipe(
    city = "LosAngeles",
    pre = Recipe(Seq(
      Rename("STREET", "location"), // overwrites raw `LOCATION`
      Rename("STATION_NAME", "neighbourhood", keepOrig = true),
      SanitizeNames,
      Rename("crime_category_description", "Description", keepOrig = true),
      Recode("description", losAngelesDescr))),
    coordFilter = Recipe(Seq(
      RequireNonEmpty("latitude"),
      RequireNonEmpty("longitude"),
      // `LosAngeles-notebook.ipynb:622-627`: only positive-latitude check
      CoordBounds("latitude", "longitude", latGt = Some(0)))),
    post = Recipe(Seq(
      DeriveGeoFromLatLon("latitude", "longitude"),
      DropColumns(Seq("latitude", "longitude")),
      DeriveAmPmParts("crime_date"),
      AssembleDatetime,
      DropColumns(Seq("crime_date", "crime_year")),
      Recode("gang_related", Seq("Y" -> "1", "N" -> "0")),
      IntColumnsLenient(Seq("gang_related")),
      descriptors("LosAngeles", "LosAngeles-notebook"))),
    referenceLoaded = 172860L,
    referenceDeleted = 11421L)

  val all: Seq[CityRecipe] = Seq(baltimore, detroit, losAngeles)
}
