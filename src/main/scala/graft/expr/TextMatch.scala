package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Analyzed text matching — the engine-level replacement for Elasticsearch's
  * dual-field mapping (every string indexed both exact and analyzed via the
  * `.split` subfield, `notebooks/lib/esindex.py:70-97`) and the webapp's
  * `match_phrase_prefix` queries (`services/webapp/src/collections.js:185-191`).
  *
  * Analyzer semantics are defined precisely (SURVEY.md §7.4) rather than
  * bug-compatible with Lucene: lowercase, then split on runs of
  * non-alphanumeric ASCII (`[^a-z0-9]+`). Both the engine side and any SQL
  * oracle can express this identically.
  *
  * Everything here is built-in `Column` algebra — stays inside whole-stage
  * codegen; no UDFs.
  */
object TextMatch {

  /** Tokenize a query string the same way [[normalized]] treats a column —
    * driver-side twin of the executor-side normalization.
    */
  def analyze(text: String): Seq[String] =
    text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq

  /** The analyzed form of a text column: lowercased with every run of
    * non-alphanumerics collapsed to a single space. Not trimmed — matching
    * always goes through the space-padded form below, so edge spaces are
    * harmless and the expression stays a cheap two-op chain.
    */
  def normalized(c: Column): Column =
    regexp_replace(lower(c), "[^a-z0-9]+", " ")

  /** Space-padded normalized text: token boundaries become literal spaces so
    * token-sequence matching is substring matching.
    */
  private def padded(c: Column): Column =
    concat(lit(" "), normalized(c), lit(" "))

  /** Phrase-prefix match (ES `match_phrase_prefix` over the `.split` field):
    * the query's tokens appear contiguously in the column's token stream,
    * with the final token matched as a prefix. An empty/non-token query
    * matches everything (the webapp only emits the clause for non-empty
    * input, `collections.js:184-191`).
    */
  def phrasePrefix(c: Column, query: String): Column = {
    val toks = analyze(query)
    if (toks.isEmpty) lit(true)
    // " tok1 tok2 tokN" against " text ": every token but the last is
    // followed by a space (complete word); the last may continue (prefix).
    else instr(padded(c), " " + toks.mkString(" ")) > 0
  }

  /** Whole-token match — ES `match` on an analyzed field with a single-term
    * query (the typeahead's filtered suggest path, `views.js:378-412`).
    */
  def containsToken(c: Column, token: String): Column = {
    val toks = analyze(token)
    if (toks.isEmpty) lit(true)
    else instr(padded(c), " " + toks.mkString(" ") + " ") > 0
  }

  /** DuckDB-compatible SQL text for the same phrase-prefix predicate — used
    * by `SparkEntry.oracleSql` so the oracle exercises identical semantics.
    */
  def phrasePrefixSql(column: String, query: String): String = {
    val toks = analyze(query)
    if (toks.isEmpty) "TRUE"
    else {
      val needle = (" " + toks.mkString(" ")).replace("'", "''")
      s"position('$needle' in ' ' || regexp_replace(lower($column), '[^a-z0-9]+', ' ', 'g') || ' ') > 0"
    }
  }
}
