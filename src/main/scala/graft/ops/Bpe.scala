package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING (Sennrich et al. 2016 — the
  * construction under the GPT-2/RoBERTa/Llama vocabularies) as a
  * distributed pipeline. The brief's "BPE-ish regex" counts tokens; this
  * learns the merge table itself from the corpus.
  *
  * The published algorithm is inherently sequential in the MERGES (merge
  * k+1 counts pairs in the corpus AS REWRITTEN by merges 1..k) but not in
  * the data — and its standard formulation already collapses the corpus to
  * a WORD-FREQUENCY table before iterating (pair statistics are identical:
  * a pair occurs freq(w) times per containing word, and merges never cross
  * word boundaries). That factorization is the whole scale story:
  *
  *  - ONE corpus-sized exchange builds `(word, freq)` — the same Zipf
  *    vocabulary bound as every head table in this repo;
  *  - the k merge iterations then run over the vocab-sized table only:
  *    per-iteration cost is independent of corpus size, so training cost
  *    is corpus-pass + k × |vocab| — at 100 TB the corpus pass dominates
  *    and the iteration tail is noise;
  *  - each iteration collects exactly ONE row (the argmax pair) — the
  *    bounded-collect discipline (`maxPairsCollect`-class guards are not
  *    needed; the limit(1) IS the bound).
  *
  * Symbol strings are TWO-SPACE-joined: merge application is then one
  * global `regexp_replace(left + "  " + right → leftright)`, whose
  * leftmost non-overlapping scan is exactly BPE's in both Java regex and
  * RE2 — the two inner separators are consumed with the pair, so
  * consecutive matches never contend for a shared delimiter (the classic
  * single-space encoding breaks on "a a a a": match one consumes the space
  * the next match needs). Symbols are analyzer tokens' characters
  * ([a-z0-9]) plus the end-of-word marker — no regex metacharacters, so
  * patterns compose by concatenation and the whole loop restates in ANSI
  * SQL (the `vocab_bpe_merges` oracle replays every iteration verbatim).
  *
  * Ties in the argmax pair break (count DESC, left ASC, right ASC) — the
  * published implementations' "first" under a deterministic total order,
  * so the merge table is reproducible cross-engine.
  */
object Bpe {

  /** Two-space symbol separator (see scaladoc for why two). */
  val Sep = "  "

  /** End-of-word symbol, kept distinct from the final character so learned
    * pieces distinguish "er" mid-word from "er</w>" word-final (Sennrich's
    * construction).
    */
  val EndOfWord = "</w>"

  /** The corpus collapsed to analyzer-word frequencies — the one
    * corpus-sized exchange of training.
    */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(graft.expr.TextShingles.tokenize(col(textCol))).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("freq"))

  /** Initial symbol string of a word: its characters two-space-joined,
    * plus the end-of-word symbol ("low" → "l  o  w  </w>").
    */
  private[ops] def initSymbols(word: Column): Column =
    concat_ws(Sep, concat(split(word, ""), array(lit(EndOfWord))))

  /** Weighted adjacent-pair counts over the current symbol strings —
    * vocab-sized input, one small exchange.
    */
  private[ops] def pairCounts(words: DataFrame): DataFrame = {
    val syms = split(col("syms"), Sep)
    val n1 = greatest(size(syms) - 1, lit(0))
    words.select(col("freq"),
        explode(zip_with(slice(syms, lit(1), n1), slice(syms, lit(2), n1),
          (a, b) => struct(a.as("left"), b.as("right")))).as("p"))
      .groupBy(col("p.left").as("left"), col("p.right").as("right"))
      .agg(sum(col("freq")).as("pair_count"))
  }

  /** Train `numMerges` BPE merges. Returns (rank, left, right, pair_count)
    * with rank 1-based in learned order; stops early when no pair reaches
    * `minPairCount`. Each iteration localCheckpoints the vocab-sized
    * rewritten word table (truncating the k-deep lineage — the repo's
    * iterative-refinement pattern, [[Similarity]] codebooks) and frees its
    * predecessor.
    *
    * The per-iteration checkpoint is LAZY (r18 optimization): an eager one
    * runs a whole extra job per merge — at 8 merges the training was ~16
    * scheduler round-trips over a vocab-sized table, pure job overhead.
    * The lazy checkpoint materializes inside the NEXT iteration's top-pair
    * collect (one job per merge), and the predecessor's blocks are freed
    * only AFTER that collect — a lazy checkpoint's lineage is truncated,
    * so its input blocks must outlive its materialization.
    */
  def trainMerges(
      docs: DataFrame,
      textCol: String,
      numMerges: Int,
      minPairCount: Long = 2L): Seq[(Int, String, String, Long)] = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    var words = wordCounts(docs, textCol)
      .select(initSymbols(col("word")).as("syms"), col("freq"))
      .localCheckpoint()
    var prev: DataFrame = null
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var rank = 1
    var exhausted = false
    while (rank <= numMerges && !exhausted) {
      val best = pairCounts(words)
        .where(col("pair_count") >= minPairCount)
        .orderBy(desc("pair_count"), asc("left"), asc("right"))
        .limit(1)
        .collect()
      // `words` is materialized now — its lazily-checkpointed input can go.
      // INVARIANT the deferred unpersist rests on: pairCounts' groupBy
      // shuffle forces FULL materialization of every partition of the lazy
      // localCheckpoint during the limit(1).collect() above. If pairCounts
      // ever became a narrow/partial plan (no exchange), only the scanned
      // partitions would persist and freeing `prev` here would break later
      // recomputes — materialize defensively (words.count()) in that case.
      if (prev != null) { prev.unpersist(blocking = false); prev = null }
      if (best.isEmpty) exhausted = true
      else {
        val (l, r, c) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((rank, l, r, c))
        val next = words
          .select(regexp_replace(col("syms"), lit(l + Sep + r), lit(l + r)).as("syms"),
            col("freq"))
          .localCheckpoint(eager = false)
        prev = words
        words = next
        rank += 1
      }
    }
    words.unpersist(blocking = false)
    if (prev != null) prev.unpersist(blocking = false)
    merges.result()
  }

  /** The learned merge table as a DataFrame (the `vocab_bpe_merges`
    * serving shape).
    */
  def mergeTable(
      docs: DataFrame,
      textCol: String,
      numMerges: Int,
      minPairCount: Long = 2L): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    trainMerges(docs, textCol, numMerges, minPairCount)
      .toDF("rank", "left", "right", "pair_count")
  }

  /** Segment text with a learned merge table: init symbols per word, apply
    * every merge in rank order (the inference side of BPE — the same
    * leftmost-non-overlapping replace, now k row-local regexes fused into
    * one projection), return the word's pieces. The merge list is
    * model-sized (k rows) — it rides the closure, not a join.
    */
  def segmentWords(
      words: DataFrame,
      wordCol: String,
      merges: Seq[(Int, String, String, Long)]): DataFrame = {
    val applied = merges.sortBy(_._1).foldLeft(initSymbols(col(wordCol))) {
      case (c, (_, l, r, _)) => regexp_replace(c, lit(l + Sep + r), lit(l + r))
    }
    words.withColumn("pieces", split(applied, Sep))
  }

  /** Learned-BPE token counts per document — the token-budget currency of
    * every downstream selection/packing stage, measured in the tokenizer
    * actually trained on this corpus instead of the whitespace proxy.
    *
    * Scale shape: the corpus's DISTINCT words are segmented once (a
    * vocab-sized projection — the same Zipf collapse training rides), the
    * word → piece-count table broadcasts, and the corpus pays one
    * broadcast join plus its per-doc aggregation. Re-segmenting every
    * occurrence would run k regexes over corpus volume; this runs them
    * over vocab volume.
    */
  def tokenCounts(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      merges: Seq[(Int, String, String, Long)]): DataFrame = {
    val tokens = docs.select(col(idCol),
      explode(graft.expr.TextShingles.tokenize(col(textCol))).as("word"))
    val segmented = segmentWords(tokens.select("word").distinct(), "word", merges)
      .select(col("word"), size(col("pieces")).cast("long").as("_np"))
    val agg = tokens.join(broadcast(segmented), "word")
      .groupBy(col(idCol)).agg(sum(col("_np")).as("bpe_tokens"))
    docs.select(col(idCol))
      .join(agg, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("bpe_tokens"), lit(0L)).as("bpe_tokens"))
  }
}
