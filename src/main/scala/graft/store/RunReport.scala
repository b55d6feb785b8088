package graft.store

import graft.dict.Dictionary
import graft.etl.Harmonizer
import org.apache.spark.sql.{DataFrame, SparkSession}

/** S9 (SURVEY §2.1) — run-report publishing. The reference publishes the
  * EXECUTED notebook as HTML next to the harmonized data
  * (`nbconvert` → `s3 cp` to the `docs/` path every dataset descriptor's
  * `notebook_html` column points at). The engine-native equivalent of that
  * artifact is the RUN's own documentation: what was loaded and deleted,
  * how every published column derives from the source (the [[Harmonizer]]
  * lineage the dictionary also serves), and the dictionary summary — as a
  * self-contained HTML page written through the same Hadoop `FileSystem`
  * seam as every sink, staged-then-promoted like [[Sources.fetchToRaw]].
  */
object RunReport {

  private def esc(s: String): String =
    Option(s).getOrElse("").replace("&", "&amp;").replace("<", "&lt;")
      .replace(">", "&gt;").replace("\"", "&quot;")

  /** Render one harmonization run as a static HTML document. The
    * dictionary frame is optional (pass the profiled dictionary to embed
    * the per-column summary table the webapp's fetch serves).
    */
  def render(
      city: String,
      loaded: Long,
      deleted: Long,
      h: Harmonizer,
      dictionary: Option[DataFrame] = None): String = {
    val lineage = h.df.columns.toSeq.map { c =>
      val src = h.varMap.get(c).map(o => s"source column ${esc(o)}")
        .getOrElse("unchanged name")
      val notes = h.transformDescrs.getOrElse(c, Vector.empty)
        .map(esc).mkString("; ")
      s"<tr><td>${esc(c)}</td><td>$src</td><td>$notes</td></tr>"
    }.mkString("\n")
    val dictRows = dictionary.map { d =>
      d.select("dict_field", "dict_count", "dict_countdistinct",
          "dict_countmissing", "dict_min", "dict_max", "dict_vartype")
        .collect()
        .map { r =>
          (0 until 7).map(i => s"<td>${esc(String.valueOf(r.get(i)))}</td>")
            .mkString("<tr>", "", "</tr>")
        }.mkString("\n")
    }
    val dictSection = dictRows.map { rows =>
      s"""<h2>Data dictionary</h2>
         |<table border="1"><tr><th>field</th><th>count</th><th>distinct</th>
         |<th>missing</th><th>min</th><th>max</th><th>vartype</th></tr>
         |$rows</table>""".stripMargin
    }.getOrElse("")
    s"""<!DOCTYPE html>
       |<html><head><meta charset="utf-8"><title>${esc(city)} harmonization run</title></head>
       |<body>
       |<h1>${esc(city)} harmonization run</h1>
       |<p>Loaded $loaded rows; deleted $deleted rows in cleaning filters;
       |published ${loaded - deleted} rows.</p>
       |<h2>Column lineage</h2>
       |<table border="1"><tr><th>column</th><th>lineage</th><th>transforms</th></tr>
       |$lineage</table>
       |$dictSection
       |</body></html>""".stripMargin
  }

  /** Write the rendered report to the docs path the dataset descriptor
    * advertises (staged write + promote, any Hadoop filesystem).
    */
  def publish(spark: SparkSession, html: String, targetPath: String): Unit = {
    val fs = FsOps.fileSystem(spark, targetPath)
    val target = new org.apache.hadoop.fs.Path(targetPath)
    val staged = new org.apache.hadoop.fs.Path(targetPath + "._publishing")
    val out = fs.create(staged, true)
    try out.write(html.getBytes("UTF-8")) finally out.close()
    FsOps.promote(fs, staged, target)
  }

  /** Convenience: profile + render + publish one run. */
  def publishRun(
      spark: SparkSession,
      city: String,
      loaded: Long,
      deleted: Long,
      h: Harmonizer,
      targetPath: String): Unit =
    publish(spark, render(city, loaded, deleted, h,
      Some(Dictionary.profileHarmonized(h))), targetPath)
}
