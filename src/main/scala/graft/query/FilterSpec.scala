package graft.query

import graft.expr.TextMatch
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Search-predicate AST — the engine-level restatement of the webapp's
  * widget-to-Elasticsearch query compiler
  * (`services/webapp/src/collections.js:146-257`, SURVEY.md §2.4 Q1-Q9).
  *
  * Each widget type contributes one predicate form; the data dictionary's
  * `dict_vartype` decides which form a field supports. `compile` produces a
  * boolean `Column` (Catalyst folds and pushes it down — the ES `bool.must`
  * becomes plain Column conjunction); `render` reproduces the webapp's
  * human-readable Lucene-ish display text.
  */
sealed trait FilterSpec {
  /** Q7: predicate compilation — AND of all member predicates. */
  def compile: Column

  /** Q9: display-text rendering (`collections.js:209-257`). */
  def render: String

  /** Fields this predicate reads — the input to the rollup covering check
    * ([[graft.query.PreAgg.covers]]): a filter is rollup-servable iff
    * every field here is a rollup dimension.
    */
  def fields: Seq[String]
}

object FilterSpec {

  private def escName(name: String): String = name.replaceAll("\\s", "\\\\ ")

  /** Q1 — no enabled widgets: `match_all` (`collections.js:147,197-199`). */
  case object MatchAll extends FilterSpec {
    def compile: Column = lit(true)
    def render: String = "*"
    def fields: Seq[String] = Seq.empty
  }

  /** Q2 — numeric range slider `[lo, hi]`, both ends inclusive
    * (`collections.js:158-160`).
    */
  final case class NumericRange(field: String, lo: Double, hi: Double) extends FilterSpec {
    def compile: Column = col(field) >= lo && col(field) <= hi
    def render: String = {
      val n = escName(field)
      s"$n:>=${fmtNum(lo)} AND $n:<=${fmtNum(hi)}"
    }
    def fields: Seq[String] = Seq(field)
  }

  /** Q3 — enum multi-select compiles to IN (the ES `bool.should` +
    * `minimum_should_match:1` is an OR, `collections.js:161-174`).
    */
  final case class EnumIn(field: String, values: Seq[String]) extends FilterSpec {
    def compile: Column = col(field).isin(values: _*)
    def render: String = {
      val n = escName(field)
      // Reference quirk kept: the enum clause starts with a space and only
      // parenthesizes when multi-valued (`collections.js:226-237`).
      val inner = " " + values.map(v => s"""$n:"$v"""").mkString(" OR ")
      if (values.length > 1) s"($inner)" else inner
    }
    def fields: Seq[String] = Seq(field)
  }

  /** Q4 — boolean radio compiles to equality against 0/1
    * (`collections.js:175-177`; value coding `views.js:241-250`).
    */
  final case class BoolEq(field: String, value: Int) extends FilterSpec {
    def compile: Column = col(field) === value
    def render: String = s"${escName(field)}:$value"
    def fields: Seq[String] = Seq(field)
  }

  /** Q5 — datetime range in epoch millis (`collections.js:178-184`); default
    * widget span is `[0, now]` (`models.js:65-69`).
    */
  final case class DateTimeRange(field: String, fromMillis: Long, toMillis: Long) extends FilterSpec {
    def compile: Column = {
      val c = col(field)
      c >= timestamp_millis(lit(fromMillis)) && c <= timestamp_millis(lit(toMillis))
    }
    def render: String = {
      val n = escName(field)
      s"$n:>=$fromMillis AND $n:<=$toMillis"
    }
    def fields: Seq[String] = Seq(field)
  }

  /** Q6 — text phrase-prefix over the analyzed (`.split`) form of the field
    * (`collections.js:185-191`; dual-field mapping `esindex.py:70-97`).
    * Semantics per SURVEY.md §7.4: lowercase, split on non-alphanumeric; the
    * query terms must appear contiguously with the last term as a prefix.
    */
  final case class PhrasePrefix(field: String, query: String) extends FilterSpec {
    def compile: Column = TextMatch.phrasePrefix(col(field), query)
    def render: String = s"""${escName(field)}:"* $query*""""
    def fields: Seq[String] = Seq(field)
  }

  /** Q7 — conjunction of all enabled widgets (`collections.js:194-199`). */
  final case class And(specs: Seq[FilterSpec]) extends FilterSpec {
    def compile: Column =
      if (specs.isEmpty) MatchAll.compile else specs.map(_.compile).reduce(_ && _)
    def render: String =
      if (specs.isEmpty) MatchAll.render else specs.map(_.render).mkString(" AND ")
    def fields: Seq[String] = specs.flatMap(_.fields).distinct
  }

  /** Build the conjunction the way the webapp does: empty widget list →
    * match_all, else bool-must of each widget's predicate.
    */
  def conjunction(specs: Seq[FilterSpec]): FilterSpec =
    if (specs.isEmpty) MatchAll else And(specs)

  private def fmtNum(d: Double): String =
    if (d == d.floor && math.abs(d) < 1e15) d.toLong.toString else d.toString
}
