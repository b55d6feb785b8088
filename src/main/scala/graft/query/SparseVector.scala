package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ES `sparse_vector` query — the learned-sparse-retrieval serving shape
  * (ELSER/SPLADE; ES 8.15's successor to `text_expansion`): documents
  * carry a sparse term→weight vector at rest, the query brings its own
  * `(term, weight)` list, and the score is the sparse dot product
  * `Σ_{t ∈ both} q_w(t) · d_w(t)` (Lucene executes it as summed
  * term-impact queries over the inverted index).
  *
  * Spark-first restatement: the at-rest representation is a POSTINGS
  * table `(id, term, weight)` — [[tfPostings]] explodes the analyzed
  * view with tf as the default impact weight (a learned-expansion
  * pipeline writes its own weights into the same schema; the serving
  * algebra is identical either way). Scoring is ONE broadcast hash join
  * of the postings against the query's literal rows + ONE hash
  * aggregate keyed by doc — work ∝ the postings of the QUERY'S terms
  * (the inverted-index property), never a per-document pass over full
  * texts. At corpus scale the at-rest layout is TERM-BUCKET
  * partitioned ([[tfPostingsBucketed]] — `term_bucket = portable
  * hash(term) mod B`; partitioning by raw term would mean one
  * directory per vocabulary entry, a small-files disaster). The query
  * terms are driver-side literals, so their buckets are TOO: [[score]]
  * adds a STATIC `term_bucket IN (…)` partition filter (strictly
  * better than dynamic pruning — no subquery broadcast, the unprobed
  * directories never even enumerate) plus the `(term_bucket, term)`
  * join keys; the spec pins the PartitionFilters line.
  *
  * Float discipline (the cross-engine oracle contract): document
  * weights from [[tfPostings]] are small integers and the fixture's
  * query weights are DYADIC (exact binary fractions), so every product
  * and the aggregation sum are IEEE-exact in any fold order — the same
  * reasoning as the BM25 integer-stats family. Arbitrary learned
  * weights make the sum order-dependent; callers needing bit-stable
  * scores under them should quantize to dyadics (SQ8-style) first.
  */
object SparseVector {

  /** tf-weighted postings of the analyzed text — the default at-rest
    * sparse vectors, `(idCol, term, weight)`. One explode + one count
    * aggregate keyed by the output's own key ([[TermVectors]] minus the
    * position list).
    */
  def tfPostings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    TermVectors.termVectors(docs, idCol, textCol)
      .select(col(s"`$idCol`"), col("term"),
        col("freq").cast("double").as("weight"))

  /** The term-bucket partition key of the at-rest postings layout:
    * the portable seeded hash of the term folded into `numBuckets` —
    * the same md5-derived hash family every cross-engine-reproducible
    * key in this repo uses, so a SQL twin can recompute it.
    */
  def termBucket(term: Column, numBuckets: Int): Column =
    floor(graft.ops.Sampling.hashUnit(term, seed = 17) * numBuckets)
      .cast("int")

  /** [[tfPostings]] plus the `term_bucket` partition column — write this
    * `partitionBy("term_bucket")` and [[score]] against the read-back
    * table prunes the scan to the query terms' buckets.
    *
    * The layout is SELF-DESCRIBING: a constant `num_buckets` column
    * (RLE-compressed to nothing in parquet) records the bucket count the
    * terms were hashed with, and [[score]] verifies its argument against
    * it — a caller scoring a 64-bucket table with `numBuckets = 32` would
    * otherwise hash the query terms into the WRONG buckets and get an
    * empty result with no error, the silently-degenerate failure mode
    * this engine rejects loudly everywhere else.
    */
  def tfPostingsBucketed(docs: DataFrame, idCol: String, textCol: String,
      numBuckets: Int = 64): DataFrame = {
    require(numBuckets >= 1, s"sparse_vector: numBuckets must be >= 1")
    tfPostings(docs, idCol, textCol)
      .withColumn("term_bucket", termBucket(col("term"), numBuckets))
      .withColumn("num_buckets", lit(numBuckets))
  }

  /** Sparse dot-product scores of every document sharing at least one
    * term with the query: broadcast the (term, weight) literals, join on
    * term — plus `term_bucket` when the postings carry it (recomputed
    * for the query literals via [[termBucket]]), which is what lets a
    * bucket-partitioned at-rest scan dynamically prune. `numBuckets`
    * MUST match the layout's ([[tfPostingsBucketed]]) — a mismatch
    * hashes the query terms into the wrong buckets and the join would
    * come back EMPTY. The layout's own `num_buckets` column ENFORCES the
    * contract: when present, a mismatched argument raises before any
    * scoring runs (one limit-1 footer probe of the unpruned table — the
    * probe must not use the about-to-be-wrong bucket filter). A layout
    * without the column (hand-built postings) is trusted as before.
    * Duplicate query terms are a caller error (their weights would
    * double-count invisibly).
    */
  def score(postings: DataFrame, idCol: String,
      queryWeights: Seq[(String, Double)],
      numBuckets: Int = 64): DataFrame = {
    require(queryWeights.nonEmpty, "sparse_vector: empty query")
    require(queryWeights.map(_._1).distinct.size == queryWeights.size,
      "sparse_vector: duplicate query terms")
    val spark = postings.sparkSession
    import spark.implicits._
    val bucketed = postings.columns.contains("term_bucket")
    if (bucketed && postings.columns.contains("num_buckets"))
      postings.select("num_buckets").limit(1).collect().headOption.foreach { r =>
        val layoutB = r.getInt(0)
        require(layoutB == numBuckets,
          s"sparse_vector: layout was bucketed with num_buckets=$layoutB " +
            s"but the caller passed numBuckets=$numBuckets — the query terms " +
            "would hash into the wrong buckets and silently match nothing")
      }
    val q =
      if (bucketed)
        queryWeights.toDF("term", "_qw")
          .withColumn("term_bucket", termBucket(col("term"), numBuckets))
      else queryWeights.toDF("term", "_qw")
    val joined =
      if (bucketed) {
        // query buckets are literal-derived — resolve them DRIVER-SIDE
        // and push a static partition filter (no dynamic-pruning
        // subquery needed; unprobed directories never enumerate)
        val qBuckets = q.select("term_bucket").distinct()
          .collect().map(_.getInt(0)).toSeq
        postings.where(col("term_bucket").isin(qBuckets: _*))
          .join(broadcast(q), Seq("term_bucket", "term"))
      } else postings.join(broadcast(q), Seq("term"))
    joined.groupBy(col(s"`$idCol`"))
      .agg(sum(col("weight") * col("_qw")).as("score"))
  }

  /** ES `sparse_vector` `prune`/`pruning_config` — the stop-word guard for
    * learned-sparse queries (an ELSER expansion routinely carries hundreds
    * of low-weight tokens whose postings dominate serving cost): drop
    * query tokens that are BOTH corpus-frequent outliers AND
    * insignificant to the query. A token is pruned iff
    *
    *   df(t) > freqRatioThreshold · avgDf   AND
    *   w(t)  < weightThreshold · max query weight
    *
    * (ES defaults 5 and 0.4: "more than five times the average frequency
    * of all tokens in the field" and "less than 0.4 of the best weight" —
    * both conditions must hold, so a frequent-but-heavy token and a
    * rare-but-light token each survive). `onlyScorePrunedTokens = true`
    * returns the COMPLEMENT — ES's rescore idiom: retrieve on the kept
    * tokens, rescore the window on the pruned remainder.
    *
    * df comes from the postings themselves (one row per (doc, term) —
    * a row count per term IS document frequency) and the query terms' dfs
    * collect driver-side bounded by the query size. avgDf is one
    * aggregate over the postings; at corpus scale serve from a maintained
    * vocabulary-sized df table (the [[graft.streaming.EventStreams
    * .maintainGramDf]] pattern) instead of re-scanning per query.
    *
    * Never prunes the whole query — structurally: the best-weight token
    * can't be below `weightThreshold · best` (threshold ≤ 1), so the kept
    * list always holds at least the query's heaviest token. With
    * `onlyScorePrunedTokens` an empty PRUNE set raises instead —
    * rescoring on nothing is a caller error.
    */
  def prune(postings: DataFrame, queryWeights: Seq[(String, Double)],
      freqRatioThreshold: Double = 5.0, weightThreshold: Double = 0.4,
      onlyScorePrunedTokens: Boolean = false): Seq[(String, Double)] =
    pruneAgainstDf(dfStats(postings), queryWeights,
      freqRatioThreshold, weightThreshold, onlyScorePrunedTokens)

  /** The vocabulary-sized `(term, df)` table of a postings table — one
    * row per (doc, term) makes df a row count per term. This is the
    * artifact a deployment MAINTAINS (the
    * [[graft.streaming.EventStreams.maintainGramDf]] pattern applies
    * verbatim with terms as the key) so [[pruneAgainstDf]] never
    * re-scans the corpus per query.
    */
  def dfStats(postings: DataFrame): DataFrame =
    postings.groupBy("term").agg(count(lit(1)).cast("double").as("df"))

  /** [[prune]] against a PRECOMPUTED `(term, df)` table — the serving
    * shape at corpus scale: the df table is vocabulary-sized (cacheable,
    * incrementally maintainable), the average folds from it in one tiny
    * aggregate, and only the query terms' rows collect (broadcast-join
    * bounded by the query size). Identical keep/prune decisions to
    * [[prune]] whenever the table equals [[dfStats]] of the postings —
    * SparseVectorSpec pins the equality.
    */
  def pruneAgainstDf(dfTable: DataFrame, queryWeights: Seq[(String, Double)],
      freqRatioThreshold: Double = 5.0, weightThreshold: Double = 0.4,
      onlyScorePrunedTokens: Boolean = false): Seq[(String, Double)] = {
    require(queryWeights.nonEmpty, "sparse_vector prune: empty query")
    require(freqRatioThreshold >= 1 && freqRatioThreshold <= 100,
      "sparse_vector prune: freqRatioThreshold must be in [1, 100] " +
        s"(the ES tokens_freq_ratio_threshold range), got $freqRatioThreshold")
    require(weightThreshold >= 0 && weightThreshold <= 1,
      s"sparse_vector prune: weightThreshold must be in [0, 1], got $weightThreshold")
    val spark = dfTable.sparkSession
    import spark.implicits._
    val stats = dfTable.agg(avg(col("df")).as("avg_df")).head()
    val avgDf = if (stats.isNullAt(0)) 0.0 else stats.getDouble(0)
    val q = queryWeights.toDF("term", "_qw")
    val dfByTerm = dfTable
      .join(broadcast(q.select("term")), Seq("term"))
      .select(col("term"), col("df").cast("double"))
      .as[(String, Double)].collect().toMap
    val best = queryWeights.map(_._2).max
    val (pruned, kept) = queryWeights.partition { case (t, w) =>
      dfByTerm.getOrElse(t, 0.0) > freqRatioThreshold * avgDf &&
        w < weightThreshold * best
    }
    if (onlyScorePrunedTokens) {
      require(pruned.nonEmpty,
        "sparse_vector prune: onlyScorePrunedTokens with nothing pruned — " +
          "the rescore leg would score on an empty query")
      pruned
    } else kept // never empty: the heaviest token always survives (scaladoc)
  }

  /** Quantize learned sparse weights to dyadic rationals (`k / 2^bits`) so
    * scores are bit-stable under ANY aggregation fold order — the class
    * scaladoc's caveat made actionable: arbitrary ELSER-style floats make
    * `Σ tf·w` order-dependent, but integer tf × dyadic w products are
    * IEEE-exact and their sums stay exact far beyond any realistic
    * magnitude. Rounds half-up via `floor(w·2^bits + 0.5) / 2^bits` — the
    * same arithmetic as this repo's SQ8 codes, restatable verbatim in a
    * SQL oracle. 8 bits (ES's `token_pruning` era quantization of ELSER
    * weights is also byte-granular) loses ~0.2% relative precision on
    * unit-scale weights — ranking-neutral in practice; raise `bits` when
    * in doubt.
    */
  def quantizeWeights(weights: Seq[(String, Double)], bits: Int = 8): Seq[(String, Double)] = {
    require(bits >= 1 && bits <= 30,
      s"sparse_vector quantize: bits must be in [1, 30], got $bits")
    val scale = (1L << bits).toDouble
    weights.map { case (t, w) => t -> math.floor(w * scale + 0.5) / scale }
  }

  /** Ranked page: (id, rank, score), score DESC with id tiebreak —
    * deterministic because the fixture scores are IEEE-exact (class
    * doc). The global window runs over the scored MATCH SET (docs
    * sharing a query term), which a selective sparse query keeps far
    * below corpus size; a stop-word-laden query should pre-prune its
    * weight list instead (the ES `prune` option's job).
    */
  def topK(postings: DataFrame, idCol: String,
      queryWeights: Seq[(String, Double)], k: Int,
      numBuckets: Int = 64): DataFrame = {
    require(k >= 1, s"sparse_vector: k must be >= 1, got $k")
    score(postings, idCol, queryWeights, numBuckets)
      .orderBy(desc("score"), asc(s"`$idCol`"))
      .limit(k)
      .withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(desc("score"), asc(s"`$idCol`"))))
      .select(col(s"`$idCol`"), col("rank"), col("score"))
  }
}
