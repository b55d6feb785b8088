package graft.query

import graft.expr.TextMatch
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy term retrieval at scale — the SymSpell deletion-neighborhood
  * index behind [[FilterSpec.FuzzyTerm]]'s scan form.
  *
  * ES serves `fuzzy` queries from a Levenshtein automaton over the term
  * dictionary FST; the distributed equivalent here is Wolf Garbe's
  * symmetric-delete scheme (public SymSpell algorithm): if
  * `lev(a, b) ≤ k` then deleting the edited positions from each side
  * reaches a COMMON string with ≤ k deletions per side (a substitution
  * deletes one char from each, an insert/delete one from one side) — so
  * joining the ≤k-deletion neighborhoods of the vocabulary against the
  * ≤k-deletion neighborhood of the query yields a candidate superset,
  * and a threshold-bounded `levenshtein` verify over |candidates| rows
  * (vocabulary-scale, not corpus-scale) makes it exact. Results are
  * therefore PROVABLY identical to the brute-force scan
  * ([[FilterSpecSpec]] pins the equivalence; the registered
  * `q_fuzzy_match_indexed` shares `q_fuzzy_match`'s oracle).
  *
  * 100 TB shape: the index is `|vocab| · (1 + L + L²/2)` rows — a
  * VOCABULARY-sized artifact (Heaps' law: sublinear in the corpus),
  * built once at rest beside the `_split` companions
  * ([[graft.store.SearchIndex]]'s pattern) and bucketable by variant.
  * A query expands to its own ≤k-deletion neighborhood (driver-side,
  * ≤ 1 + L + L²/2 strings), probes the index, verifies, and feeds the
  * surviving terms into one semi-join against the analyzed corpus — the
  * corpus is touched exactly once, by a pushdown-friendly token
  * containment, never by per-row edit distance.
  */
object Fuzzy {

  /** Distinct analyzed vocabulary of `textCol` — the term dictionary. */
  def vocabulary(df: DataFrame, textCol: Column): DataFrame =
    df.select(explode(split(trim(TextMatch.normalized(textCol)), " ")).as("term"))
      .where(length(col("term")) > 0)
      .distinct()

  /** The ≤`maxEdits`-deletion neighborhood of every vocabulary term:
    * `(variant, term)` rows, the term itself included (0 deletions).
    * Column-algebra only (`sequence`/`transform` over positions) — no
    * UDF, vocabulary-sized work.
    */
  def deletionIndex(vocab: DataFrame, maxEdits: Int): DataFrame = {
    require(maxEdits >= 0 && maxEdits <= 2,
      s"maxEdits must be 0..2 (the Lucene bound), got $maxEdits")
    def deletes(c: Column): Column =
      transform(
        sequence(lit(0), length(c) - 1),
        i => concat(c.substr(lit(1), i), c.substr(i + 2, length(c))))
    val d0 = array(col("term"))
    val neighborhood = maxEdits match {
      case 0 => d0
      case 1 => concat(d0, deletes(col("term")))
      case 2 =>
        val d1 = deletes(col("term"))
        concat(d0, d1, flatten(transform(d1, v => deletes(v))))
    }
    vocab.select(
        col("term"), explode(array_distinct(neighborhood)).as("variant"))
      .select(col("variant"), col("term"))
  }

  /** Driver-side twin of [[deletionIndex]] for the query term. */
  private[query] def deletionNeighborhood(term: String, maxEdits: Int): Seq[String] = {
    def deletes(s: String): Seq[String] =
      s.indices.map(i => s.substring(0, i) + s.substring(i + 1))
    val d0 = Seq(term)
    (maxEdits match {
      case 0 => d0
      case 1 => d0 ++ deletes(term)
      case 2 =>
        val d1 = deletes(term)
        d0 ++ d1 ++ d1.flatMap(deletes)
    }).distinct
  }

  /** Vocabulary terms within `maxEdits` of `term` (first `prefixLength`
    * chars exact — ES's own knob): probe the deletion index with the
    * query's neighborhood, then the exact threshold-bounded verify.
    * Output: `(term)` — the matched dictionary entries.
    */
  def matchingTerms(
      index: DataFrame, term: String, maxEdits: Int,
      prefixLength: Int = 0): DataFrame = {
    val q = term.toLowerCase
    val probes = deletionNeighborhood(q, maxEdits)
    val verified = index
      .where(col("variant").isin(probes: _*))
      .select("term").distinct()
      // length pruning is implied by the neighborhood construction; the
      // levenshtein verify is what makes the candidate superset exact.
      .where(levenshtein(col("term"), lit(q)) <= maxEdits)
    if (prefixLength > 0)
      verified.where(substring(col("term"), 1, prefixLength) === q.take(prefixLength))
    else verified
  }

  /** ES term suggester — "did you mean": vocabulary terms within
    * `maxEdits` of `input`, ranked the deterministic way (distance
    * ascending, document frequency descending, term ascending — ES ranks
    * by string-similarity score then frequency; classic Levenshtein
    * replaces its internal distance, the [[FilterSpec.FuzzyTerm]]
    * transpositions delta). The input term itself (distance 0) is never
    * suggested. Output: `(term, freq, distance)`, top `n`.
    *
    * Candidates come from the same SymSpell deletion probe as retrieval
    * — vocabulary-sized work; frequency is DOCUMENT frequency (one count
    * per containing document, ES's popular-mode statistic).
    */
  def suggestTerms(
      df: DataFrame, textCol: Column, input: String,
      maxEdits: Int = 2, n: Int = 5): DataFrame = {
    val q = input.toLowerCase
    val vocab = df
      .select(array_distinct(
        split(trim(TextMatch.normalized(textCol)), " ")).as("_ts"))
      .select(explode(col("_ts")).as("term"))
      .where(length(col("term")) > 0)
      .groupBy("term").agg(count(lit(1)).as("freq"))
    val cand = matchingTerms(deletionIndex(vocab.select("term"), maxEdits), q, maxEdits)
    vocab.join(broadcast(cand), "term")
      .withColumn("distance", levenshtein(col("term"), lit(q)))
      .where(col("distance") >= 1)
      .orderBy(asc("distance"), desc("freq"), asc("term"))
      .limit(n)
  }

  /** End-to-end indexed fuzzy retrieval: documents of `df` containing an
    * analyzed token within `maxEdits` of `term`. Equals
    * `df.where(FilterSpec.FuzzyTerm(field, term, maxEdits, prefixLength)
    * .compile)` — the scan twin — by the SymSpell superset + exact
    * verify argument above.
    */
  def fuzzyDocs(
      df: DataFrame, textField: String, term: String, maxEdits: Int,
      prefixLength: Int = 0): DataFrame = {
    val vocab = vocabulary(df, col(textField))
    val matched = matchingTerms(deletionIndex(vocab, maxEdits), term, maxEdits, prefixLength)
    val tokens = df.withColumn("_tok",
      explode(split(trim(TextMatch.normalized(col(textField))), " ")))
    val hit = tokens
      .join(broadcast(matched), tokens("_tok") === matched("term"), "left_semi")
    hit.drop("_tok").dropDuplicates(df.columns)
  }
}
