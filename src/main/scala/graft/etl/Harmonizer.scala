package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Column-level harmonization with lineage, restating the reference's
  * harmonization helpers (`notebooks/lib/harmonizeCrimeIncidents.py:246-329`)
  * as an immutable wrapper over a `DataFrame`.
  *
  *   - `varMap` records `newName -> originalName` lineage, surfaced in the
  *     data dictionary's `dict_varmapping` column.
  *   - `transformDescrs` records `column -> human-readable transform notes`,
  *     accreted by [[mapValues]] and friends.
  *
  * Deliberate deviations from the reference (SURVEY.md §7.4):
  *   - `mapValues` builds typed `when(...)` chains instead of interpolating
  *     values into a SQL string (the reference's `selectExpr` CASE at
  *     `harmonizeCrimeIncidents.py:285-296` breaks on embedded quotes);
  *   - `setColDataTypes` does not reproduce the reference's `NameError` bug
  *     (`harmonizeCrimeIncidents.py:305`).
  */
final case class Harmonizer(
    df: DataFrame,
    varMap: Map[String, String] = Map.empty,
    transformDescrs: Map[String, Vector[String]] = Map.empty,
) {

  private def describe(column: String, note: String): Map[String, Vector[String]] =
    transformDescrs.updated(column, transformDescrs.getOrElse(column, Vector.empty) :+ note)

  /** Copy `oldVar` to `newVar`, dropping the original unless `keepOrig` is set
    * or the names differ only by case; record lineage. When `oldVar == newVar`
    * with `keepOrig`, the original is preserved under `<oldVar>_orig`
    * (reference `harmonizeCrimeIncidents.py:263-283`).
    */
  def mapVar(oldVar: String, newVar: String, keepOrig: Boolean = false): Harmonizer = {
    require(df.columns.contains(oldVar), s"mapVar: no such column '$oldVar'")
    if (oldVar == newVar && keepOrig) {
      val orig = s"${oldVar}_orig"
      copy(
        df = df.withColumn(orig, col(oldVar)),
        varMap = varMap.updated(newVar, oldVar),
        transformDescrs = describe(newVar, s"original values preserved as $orig"))
    } else {
      val mapped = df.withColumn(newVar, col(oldVar))
      val dropOld = !keepOrig && !oldVar.equalsIgnoreCase(newVar)
      copy(
        df = if (dropOld) mapped.drop(oldVar) else mapped,
        varMap = varMap.updated(newVar, oldVar))
    }
  }

  /** Recode values of `column` through `valueMap`; unmapped values pass
    * through unchanged (the reference CASE's `ELSE col` branch,
    * `harmonizeCrimeIncidents.py:292`).
    */
  def mapValues(column: String, valueMap: Seq[(String, String)]): Harmonizer = {
    // Case-insensitive resolution, like the reference's PySpark lookup: LA
    // recodes 'description' against a column created as 'Description'
    // (`LosAngeles-notebook.ipynb:668`); `withColumn` then renames it to the
    // requested casing, which is how the reference output ends up lowercase.
    require(df.columns.exists(_.equalsIgnoreCase(column)), s"mapValues: no such column '$column'")
    if (valueMap.isEmpty) this
    else {
      val c = col(column)
      val recoded = valueMap.foldLeft(Option.empty[org.apache.spark.sql.Column]) {
        case (acc, (from, to)) =>
          Some(acc.fold(when(c === from, to))(_.when(c === from, to)))
      }.get.otherwise(c)
      copy(
        df = df.withColumn(column, recoded),
        transformDescrs = describe(column, s"recoded ${valueMap.size} values"))
    }
  }

  /** Characters illegal in Parquet/Athena column names
    * (`harmonizeCrimeIncidents.py:64-67,323-329`).
    */
  private val invalidNameChars = "[ ,;{}()\n\t=/&#]"

  /** Strip invalid characters and lowercase every column name, recording
    * lineage for any column actually renamed (reference
    * `harmonizeCrimeIncidents.py:323-329`).
    *
    * Two source columns sanitizing to the same name (e.g. `"Event Type"` and
    * `"eventtype"`) would silently produce duplicate columns and break every
    * later `col()` resolution far from the cause — detected here and failed
    * fast instead. All renames apply in ONE projection (`toDF`), not N
    * `withColumnRenamed` plan nodes.
    */
  def makeValidVariableNames: Harmonizer = {
    val renames = df.columns.map(c => c -> c.replaceAll(invalidNameChars, "").toLowerCase)
    val collisions = renames.groupBy(_._2).filter(_._2.length > 1)
    require(collisions.isEmpty,
      s"makeValidVariableNames: source columns collide after sanitization: " +
        collisions.map { case (to, froms) => froms.map(_._1).mkString("[", ", ", "]") + s" -> $to" }
          .mkString("; "))
    val out = if (renames.forall(r => r._1 == r._2)) df else df.toDF(renames.map(_._2).toIndexedSeq: _*)
    val lineage = renames.collect { case (from, to) if from != to => to -> from }
    copy(df = out, varMap = varMap ++ lineage)
  }

  /** Cast the given columns to INT — used for boolean-coded fields after
    * recoding (e.g. LA's `gang_related` Y/N → 1/0,
    * `LosAngeles-notebook.ipynb:828`). Restates the *intent* of the
    * reference's broken `setColDataTypes` (`harmonizeCrimeIncidents.py:304-319`).
    */
  def setIntColumns(columns: Seq[String]): Harmonizer =
    copy(
      df = columns.foldLeft(df)((d, c) => d.withColumn(c, col(c).cast(IntegerType))),
      transformDescrs = columns.foldLeft(transformDescrs)((m, c) =>
        m.updated(c, m.getOrElse(c, Vector.empty) :+ "cast to int")))

  /** Apply an arbitrary DataFrame transform while keeping lineage. */
  def transform(f: DataFrame => DataFrame): Harmonizer = copy(df = f(df))

  /** Lineage rendered for the dictionary's `dict_varmapping` column. */
  def varMapping(column: String): Option[String] = varMap.get(column)

  def transformDescr(column: String): Option[String] =
    transformDescrs.get(column).map(_.mkString("; "))
}
