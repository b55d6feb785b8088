package graft.ops

import graft.expr.TextShingles
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag (and drop) training documents sharing any
  * word n-gram with an evaluation/benchmark corpus — the standard
  * contamination control for LLM training data (GPT-3 used 13-gram overlap;
  * public papers). Beyond the reference's surface: the reference curates
  * analytics corpora, this is the training-data analogue of its
  * "harmonize-then-filter" prep stage.
  *
  * 100 TB shape: the benchmark side is small by construction (eval suites
  * are MBs, not TBs), so its distinct gram set BROADCASTS and the corpus
  * side never shuffles document text — each doc emits its per-row-DISTINCT
  * gram array (one codegen'd kernel pass, no corpus-wide distinct needed),
  * probes the broadcast hash table, and only `(doc_id, partial count)` rows
  * enter the one exchange (map-side combine). Contrast with the naive
  * corpus-side `groupBy(gram)`: that moves every token of the corpus.
  */
object Decontaminate {

  /** Per-document overlap counts: `(idCol, n_overlapping_grams)` for every
    * corpus document sharing ≥ 1 distinct word `n`-gram with `bench`.
    * Documents with no overlap (or fewer than `n` tokens) are absent.
    */
  def overlaps(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      bench: DataFrame,
      benchTextCol: String,
      n: Int): DataFrame = {
    require(n >= 1, s"decontaminate: n-gram size must be >= 1, got $n")
    val corpusGrams = corpus.select(
      col(s"`$idCol`"),
      explode(TextShingles.shingleStrings(col(s"`$textCol`"), n)).as("_gram"))
    val benchGrams = bench
      .select(explode(TextShingles.shingleStrings(col(s"`$benchTextCol`"), n)).as("_gram"))
      .distinct()
    corpusGrams
      .join(broadcast(benchGrams), "_gram")
      .groupBy(s"`$idCol`")
      .agg(count(lit(1)).as("n_overlapping_grams"))
  }

  /** The clean corpus: documents with NO `n`-gram overlap against `bench`
    * (left-anti join on the flagged id set — ids only, never text).
    */
  def clean(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      bench: DataFrame,
      benchTextCol: String,
      n: Int): DataFrame = {
    val flagged = overlaps(corpus, idCol, textCol, bench, benchTextCol, n)
      .select(col(s"`$idCol`"))
    corpus.join(broadcast(flagged), Seq(idCol), "left_anti")
  }
}
