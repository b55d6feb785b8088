package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** The corpus datasheet: hand-computed metrics and the no-Expand
  * diversity plan.
  */
class DatasheetSpec extends SparkSpecBase {
  import spark.implicits._

  private def docs = Seq(
    (1L, "one two three", "en", "a"),
    (2L, "one two three", "en", "a"), // exact duplicate text
    (3L, "four five", "fr", "b"),
    (4L, "six", "en", "c"),
  ).toDF("doc_id", "text", "lang", "source")

  test("corpusReport: hand-computed size, diversity, dup rate, concentration") {
    val out = Datasheet.corpusReport(docs, "text", "lang", "source")
      .as[(String, Double)].collect().toMap
    assert(out("n_docs") === 4.0)
    assert(out("n_tokens") === 9.0) // 3 + 3 + 2 + 1 (duplicates count)
    assert(out("mean_doc_tokens") === 9.0 / 4.0)
    assert(out("n_langs") === 2.0)
    assert(out("n_sources") === 3.0)
    assert(out("distinct_text_rate") === 3.0 / 4.0) // one exact dup pair
    assert(out("top_lang_share") === 3.0 / 4.0)     // en has 3 of 4
  }

  test("the diversity scan is one exploded aggregation — no Expand for the distinct families") {
    val plan = Datasheet.corpusReport(docs, "text", "lang", "source")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"),
      s"distinct families must go through the unpivot, not Expand:\n$plan")
  }
}
