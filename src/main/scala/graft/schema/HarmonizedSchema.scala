package graft.schema

/** UI/widget-level variable types riding on top of the physical schema.
  *
  * The reference encodes these as a comma string in the data dictionary's
  * `dict_vartype` column (`notebooks/lib/harmonizeCrimeIncidents.py:130-135`):
  * `identifier | datetime | boolean | range,min,max,step | enum,v1,v2,... |
  * text | unknown`. The type decides which predicate form a field supports
  * (see [[graft.query.FilterSpec]]).
  */
sealed trait VarType { def serialize: String }
object VarType {
  case object Identifier extends VarType { val serialize = "identifier" }
  case object DateTime extends VarType { val serialize = "datetime" }
  case object Bool extends VarType { val serialize = "boolean" }
  case object Text extends VarType { val serialize = "text" }
  case object Unknown extends VarType { val serialize = "unknown" }
  final case class Range(lo: Double, hi: Double, step: Double) extends VarType {
    def serialize = s"range,${fmt(lo)},${fmt(hi)},${fmt(step)}"
  }
  final case class Enum(values: Seq[String]) extends VarType {
    def serialize = ("enum" +: values).mkString(",")
  }

  /** Render doubles the way the reference's Python string interpolation does:
    * integral values without a trailing `.0` (`"range,2000,2017,1"`,
    * `harmonizeCrimeIncidents.py:174`) but `0.1` steps kept fractional.
    */
  private def fmt(d: Double): String =
    if (d == d.floor && !d.isInfinite && math.abs(d) < 1e15) d.toLong.toString
    else d.toString

  /** Parse the dictionary's comma-string form back into the ADT. Unknown
    * shapes fall through to [[Text]], mirroring the webapp's behavior of
    * rendering any unrecognized type as a free-text widget
    * (`services/webapp/src/views.js:454-466`).
    */
  def parse(s: String): VarType = {
    val trimmed = Option(s).getOrElse("").trim
    trimmed.split(",", -1).toList match {
      case "identifier" :: Nil => Identifier
      case "datetime" :: Nil   => DateTime
      case "boolean" :: Nil    => Bool
      case "text" :: Nil       => Text
      case "unknown" :: Nil    => Unknown
      case "range" :: lo :: hi :: step :: Nil =>
        try Range(lo.toDouble, hi.toDouble, step.toDouble)
        catch { case _: NumberFormatException => Text }
      case "enum" :: vs if vs.nonEmpty => Enum(vs)
      case _ => Text
    }
  }
}

/** Metadata for one standard (harmonized) variable.
  *
  * Mirrors the reference's per-variable dictionaries
  * (`harmonizeCrimeIncidents.py:136-236`): each standard variable carries a
  * variable group, a description, a UI-filter flag, and a widget type.
  */
final case class StdVar(
    name: String,
    group: String,
    descr: String,
    uiFilter: Boolean,
    varType: VarType,
)

/** The shared vocabulary datasets are harmonized to.
  *
  * A *soft* schema: datasets keep extra unharmonized columns; alignment across
  * datasets happens by name (see [[graft.query.Federation]]). The 13 standard
  * variables below restate `harmonizeCrimeIncidents.py:136-236`.
  */
object HarmonizedSchema {
  val VarGroupShared = "shared"
  val VarGroupDataset = "dataset"

  import VarType._

  val standardVars: Seq[StdVar] = Seq(
    StdVar("datetime", VarGroupShared, "date and time of incident", uiFilter = true, DateTime),
    StdVar("year", VarGroupShared, "year of incident", uiFilter = true, Range(2000, 2017, 1)),
    StdVar("month", VarGroupShared, "month of incident", uiFilter = true, Enum((1 to 12).map(_.toString))),
    StdVar("day", VarGroupShared, "day of month of incident", uiFilter = true, Range(1, 31, 1)),
    StdVar("hour", VarGroupShared, "hour of incident (24h)", uiFilter = true, Range(0, 23, 1)),
    StdVar("minute", VarGroupShared, "minute of incident", uiFilter = false, Range(0, 59, 1)),
    StdVar("dayofweek", VarGroupShared, "day of week of incident", uiFilter = true,
      Enum(Seq("Monday", "Tuesday", "Wednesday", "Thursday", "Friday", "Saturday", "Sunday"))),
    StdVar("description", VarGroupShared, "harmonized description of incident", uiFilter = true, Text),
    StdVar("city", VarGroupShared, "city of dataset", uiFilter = true, Text),
    StdVar("location", VarGroupShared, "street address of incident", uiFilter = true, Text),
    StdVar("neighbourhood", VarGroupShared, "neighbourhood of incident", uiFilter = true, Text),
    StdVar("geolocation", VarGroupShared, "latitude,longitude of incident", uiFilter = false, Identifier),
    StdVar("datasetdescr", VarGroupDataset, "dataset descriptor", uiFilter = false, Identifier),
  )

  val byName: Map[String, StdVar] = standardVars.map(v => v.name -> v).toMap
}
