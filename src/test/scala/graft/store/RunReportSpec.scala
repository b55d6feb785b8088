package graft.store

import graft.SparkSpecBase
import graft.etl.CityRecipes

/** S9: the run report renders the notebook-published artifact's content —
  * counts, column lineage, dictionary summary — and publishes through the
  * Hadoop FS seam.
  */
class RunReportSpec extends SparkSpecBase {

  test("renders counts, lineage, and dictionary; escapes HTML; publishes") {
    val raw = Sources.csvAllStrings(spark, "/root/repo/data/cities/Baltimore.csv")
    val (h, report) = CityRecipes.baltimore.run(raw)
    val html = RunReport.render("Baltimore", report.loaded, report.deleted, h,
      Some(graft.dict.Dictionary.profileHarmonized(h)))

    assert(html.contains(s"Loaded ${report.loaded} rows"))
    assert(html.contains(s"deleted ${report.deleted} rows"))
    // lineage: the recode column documents its source column
    assert(html.contains("<td>description</td>"))
    assert(html.contains("source column Description"))
    // dictionary summary is embedded
    assert(html.contains("<th>vartype</th>") && html.contains("<td>crimecode</td>"))

    // raw values render escaped
    val escHtml = RunReport.render("a<b", 1, 0, graft.etl.Harmonizer(
      spark.createDataFrame(Seq(Tuple1("x"))).toDF("c")))
    assert(escHtml.contains("a&lt;b") && !escHtml.contains("<b harmonization"))

    val dir = java.nio.file.Files.createTempDirectory("graft_report_spec").toFile
    dir.deleteOnExit()
    val target = dir.getAbsolutePath + "/docs/Baltimore-notebook.html"
    RunReport.publish(spark, html, target)
    assert(!new java.io.File(target + "._publishing").exists())
    assert(java.nio.file.Files.readString(java.nio.file.Paths.get(target)) === html)
  }
}
