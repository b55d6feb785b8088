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

  /** FUZZY contamination: `(idCol, bench_id, jaccard)` for every
    * (corpus doc, benchmark doc) pair whose distinct-shingle Jaccard meets
    * `threshold` — catches paraphrased/partially-rewritten benchmark leaks
    * that exact [[overlaps]] misses (the GPT-3 appendix's motivation for
    * fuzzy dedup against evals; public).
    *
    * Count-as-intersection over an inverted index, asymmetric: the bench
    * posting table BROADCASTS (eval suites are small), so candidate
    * generation is shuffle-free and only `(doc, bench, partial count)`
    * rows — pairs that actually share a shingle, pre-pruned by the
    * Jaccard size bound — reach the one exchange. Shingles travel as
    * 64-bit hashes ([[graft.expr.TextShingleAlgo.shingleHashes]]), ids and
    * counts otherwise; document text never shuffles.
    */
  def fuzzyOverlaps(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      bench: DataFrame,
      benchIdCol: String,
      benchTextCol: String,
      threshold: Double,
      shingleK: Int = 2): DataFrame = {
    require(threshold > 0 && threshold <= 1, "fuzzy: threshold must be in (0, 1]")
    val cp = corpus
      .select(col(s"`$idCol`"), TextShingles.shingleHashes(col(s"`$textCol`"), shingleK).as("_sh"))
      .where(size(col("_sh")) > 0)
      .select(col(s"`$idCol`"), size(col("_sh")).as("_n"), explode(col("_sh")).as("_s"))
    val bp = bench
      .select(col(s"`$benchIdCol`").as("bench_id"),
        TextShingles.shingleHashes(col(s"`$benchTextCol`"), shingleK).as("_sh"))
      .where(size(col("_sh")) > 0)
      .select(col("bench_id"), size(col("_sh")).as("_nb"), explode(col("_sh")).as("_s"))
    cp.join(broadcast(bp), Seq("_s"))
      // Jaccard ≥ t forces t·max(|A|,|B|) ≤ min(|A|,|B|): prune before the
      // aggregation ever sees the pair.
      .where(greatest(col("_n"), col("_nb")) * threshold <= least(col("_n"), col("_nb")))
      .groupBy(col(s"`$idCol`"), col("bench_id"), col("_n"), col("_nb"))
      .agg(count(lit(1)).as("_c"))
      .withColumn("jaccard",
        col("_c").cast("double") / (col("_n") + col("_nb") - col("_c")).cast("double"))
      .where(col("jaccard") >= threshold)
      .select(col(s"`$idCol`"), col("bench_id"), col("jaccard"))
  }

  /** CONTAINMENT contamination — the semantics eval leakage actually has:
    * a short benchmark item quoted inside a long training document. Jaccard
    * ([[fuzzyOverlaps]]) normalizes by the UNION and dilutes toward 0 as
    * the document grows; this normalizes winnowed-fingerprint overlap by
    * the BENCH item's fingerprint count, so "most of this benchmark
    * question appears in this doc" scores near 1 at any document length
    * (winnowing guarantees any shared run of ≥ `shingleK + window − 1`
    * tokens plants a common fingerprint — [[graft.expr.Winnow]]).
    *
    * Same asymmetric shape as [[fuzzyOverlaps]]: bench fingerprint postings
    * broadcast, corpus rows emit their per-row-distinct fingerprints (one
    * kernel pass), only `(doc, bench, partial count)` rows shuffle.
    * Returns `(idCol, bench_id, containment)` at `tau` or above.
    */
  def containmentOverlaps(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      bench: DataFrame,
      benchIdCol: String,
      benchTextCol: String,
      tau: Double,
      shingleK: Int = 3,
      window: Int = 4): DataFrame = {
    require(tau > 0 && tau <= 1, "containment: tau must be in (0, 1]")
    val cp = corpus
      .select(col(s"`$idCol`"),
        graft.expr.Winnow.fingerprints(col(s"`$textCol`"), shingleK, window).as("_fp"))
      .where(size(col("_fp")) > 0)
      .select(col(s"`$idCol`"), explode(col("_fp")).as("_f"))
    val bp = bench
      .select(col(s"`$benchIdCol`").as("bench_id"),
        graft.expr.Winnow.fingerprints(col(s"`$benchTextCol`"), shingleK, window).as("_fp"))
      .where(size(col("_fp")) > 0)
      .select(col("bench_id"), size(col("_fp")).as("_nb"), explode(col("_fp")).as("_f"))
    cp.join(broadcast(bp), Seq("_f"))
      .groupBy(col(s"`$idCol`"), col("bench_id"), col("_nb"))
      .agg(count(lit(1)).as("_c"))
      .withColumn("containment", col("_c").cast("double") / col("_nb").cast("double"))
      .where(col("containment") >= tau)
      .select(col(s"`$idCol`"), col("bench_id"), col("containment"))
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
      n: Int): DataFrame =
    dropFlagged(corpus, idCol,
      overlaps(corpus, idCol, textCol, bench, benchTextCol, n))

  /** [[clean]] with the CONTAINMENT detector — drop documents that contain
    * (most of) any benchmark item, the leakage semantics
    * [[containmentOverlaps]] documents.
    */
  def cleanContainment(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      bench: DataFrame,
      benchIdCol: String,
      benchTextCol: String,
      tau: Double,
      shingleK: Int = 3,
      window: Int = 4): DataFrame =
    dropFlagged(corpus, idCol,
      containmentOverlaps(corpus, idCol, textCol,
        bench, benchIdCol, benchTextCol, tau, shingleK, window))

  /** Anti-join the corpus against a flagged-ids frame (ids only, never
    * text; broadcast — flagged sets are small when the bench is).
    */
  private def dropFlagged(corpus: DataFrame, idCol: String, flagged: DataFrame): DataFrame =
    corpus.join(broadcast(flagged.select(col(s"`$idCol`")).distinct()), Seq(idCol), "left_anti")

  /** SEMANTIC decontamination: pairs of (corpus, bench) embeddings with
    * cosine ≥ `threshold` — the leakage the text detectors above cannot
    * see (a paraphrased or translated eval item shares no n-gram, no
    * shingle, no winnowed fingerprint with its source, but its embedding
    * sits next to it). Benchmark suites are small, so the bench side
    * BROADCASTS and the check is one row-local pass over corpus vectors:
    * no shuffle at any corpus size. Cost is corpus × bench dot products —
    * fine to ~10⁵ bench vectors; past that, compose the candidate
    * machinery ([[graft.ops.Similarity.semanticNearDupPairs]]'s cells or
    * LSH buckets) to prune pairs first.
    */
  def semanticOverlaps(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      bench: DataFrame,
      benchIdCol: String,
      benchVecCol: String,
      threshold: Double): DataFrame = {
    val c = corpus.select(col(s"`$idCol`"),
      graft.ops.Similarity.asDouble(col(s"`$vecCol`")).as("_cv"))
    val b = bench.select(col(s"`$benchIdCol`").as("bench_id"),
      graft.ops.Similarity.asDouble(col(s"`$benchVecCol`")).as("_bv"))
    c.join(broadcast(b), graft.ops.Similarity.cosine(col("_cv"), col("_bv")) >= threshold)
      .withColumn("cos", graft.ops.Similarity.cosine(col("_cv"), col("_bv")))
      .select(col(s"`$idCol`"), col("bench_id"), col("cos"))
  }

  /** [[clean]] with the semantic detector — drop corpus rows within
    * cosine `threshold` of any benchmark embedding.
    */
  def cleanSemantic(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      bench: DataFrame,
      benchIdCol: String,
      benchVecCol: String,
      threshold: Double): DataFrame =
    dropFlagged(corpus, idCol,
      semanticOverlaps(corpus, idCol, vecCol,
        bench, benchIdCol, benchVecCol, threshold))
}
