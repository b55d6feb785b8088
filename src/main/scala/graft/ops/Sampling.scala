package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * `df.sample()` draws from a per-partition RNG: the selected rows change
  * with partitioning, task retries, and cluster size — unacceptable when a
  * training corpus must be reproducible and auditable. Hash-based sampling
  * keys the decision on the ROW (a seeded hash of a stable key), so the
  * same row makes the same cut on any cluster at any scale, the sample
  * composes with incremental ingestion (new rows don't reshuffle old
  * decisions), and any engine can reproduce it — the unit hash is md5-based
  * specifically so a SQL oracle computes it bit-identically.
  */
object Sampling {

  /** Seeded hash of a key column mapped to [0, 1): the first 52 bits of
    * md5(seed || key) as a double (52 bits are exact in IEEE754). Portable:
    * `('0x' || substr(md5(seed || key), 1, 13))::BIGINT / 2^52` computes the
    * identical value in DuckDB/Trino-style SQL. Use [[hashUnitFast]] when
    * cross-engine reproducibility isn't needed.
    */
  def hashUnit(key: Column, seed: Int): Column =
    hashBits52(key, seed).cast("double") / lit((1L << 52).toDouble)

  /** The 52-bit non-negative integer under [[hashUnit]] — for uses that
    * need the hash as an exact integer (modular sharding) rather than a
    * unit double. Portable: `('0x' || substr(md5(seed || key), 1, 13))::BIGINT`.
    */
  def hashBits52(key: Column, seed: Int): Column =
    conv(substring(md5(concat(lit(seed.toString), key.cast("string"))), 1, 13), 16, 10)
      .cast("long")

  /** xxhash64-based unit hash — cheaper (no hex round-trip), Spark-only. */
  def hashUnitFast(key: Column, seed: Int): Column =
    shiftrightunsigned(xxhash64(lit(seed), key), 11).cast("double") / lit((1L << 53).toDouble)

  /** Keep rows whose seeded key-hash lands under `fraction` of the unit
    * interval. Deterministic per (key, seed); no RNG, no partition
    * sensitivity.
    */
  def hashSample(df: DataFrame, keyCol: String, fraction: Double, seed: Int = 42): DataFrame = {
    require(fraction >= 0 && fraction <= 1, "fraction must be in [0,1]")
    df.where(hashUnit(col(s"`$keyCol`"), seed) < fraction)
  }

  /** Per-stratum deterministic sampling: one fraction per value of
    * `stratumCol` (absent strata keep nothing). The scalable, reproducible
    * form of `sampleBy`.
    */
  def stratifiedHashSample(
      df: DataFrame,
      keyCol: String,
      stratumCol: String,
      fractions: Map[String, Double],
      seed: Int = 42): DataFrame = {
    require(fractions.values.forall(f => f >= 0 && f <= 1), "fractions must be in [0,1]")
    val fracExpr = fractions.foldLeft(lit(0.0)) { case (acc, (stratum, f)) =>
      when(col(s"`$stratumCol`") === stratum, f).otherwise(acc)
    }
    df.where(hashUnit(col(s"`$keyCol`"), seed) < fracExpr)
  }

  /** Deterministic train/validation/test split: each row gets the label of
    * the cumulative-weight interval its unit hash falls in — exactly one
    * split per row, stable under any execution plan or cluster size.
    */
  def assignSplit(
      df: DataFrame,
      keyCol: String,
      weights: Seq[(String, Double)],
      seed: Int = 42,
      splitCol: String = "split"): DataFrame =
    df.withColumn(splitCol, splitLabel(hashUnit(col(s"`$keyCol`"), seed), weights))

  /** The cumulative-interval label fold shared by [[assignSplit]] and
    * [[clusterSafeSplit]]: the label of the interval the unit hash falls
    * in.
    */
  private def splitLabel(u: Column, weights: Seq[(String, Double)]): Column = {
    require(weights.nonEmpty && weights.forall(_._2 > 0), "weights must be positive")
    val total = weights.map(_._2).sum
    val cums = weights.scanLeft(0.0)(_ + _._2 / total).tail
    weights.zip(cums).init.foldRight(lit(weights.last._1): Column) {
      case (((name, _), hi), acc) => when(u < hi, name).otherwise(acc)
    }
  }

  /** Leakage-safe train/val/test split: near-duplicate CLUSTERS are the
    * split unit, not documents — a near-dup pair straddling train and
    * test is benchmark contamination by construction (the test doc is a
    * paraphrase of a training doc), and a row-keyed [[assignSplit]]
    * straddles every cluster with probability `1 − Σwᵢ²`. Each row is
    * labeled by the unit hash of its cluster REPRESENTATIVE (the min-id
    * component label of the near-dup pair graph — the
    * [[graft.ops.Dedup.connectedComponents]] convention); singletons
    * hash their own key, so on an empty pair set this IS [[assignSplit]].
    * One left join against the component labeling (pair graphs are
    * orders of magnitude smaller than their corpora — broadcast-class)
    * plus the same row-local label fold; split sizes stay ≈ weights
    * because cluster mass is hash-distributed.
    */
  def clusterSafeSplit(
      df: DataFrame,
      keyCol: String,
      pairs: DataFrame,
      weights: Seq[(String, Double)],
      seed: Int = 42,
      splitCol: String = "split",
      idA: String = "id_a",
      idB: String = "id_b"): DataFrame = {
    val comps = graft.ops.Dedup.connectedComponents(pairs, idA, idB)
      .select(col("id").as("_cc_id"), col("component").as("_cc_unit"))
    df.join(comps, col(s"`$keyCol`") === col("_cc_id"), "left")
      .withColumn(splitCol,
        splitLabel(hashUnit(coalesce(col("_cc_unit"), col(s"`$keyCol`")), seed),
          weights))
      .drop("_cc_id", "_cc_unit")
  }

  /** Per-source keep-fractions that re-weight observed `counts` to the
    * `targets` mixture with MAXIMUM retention: the binding source (the one
    * whose observed share falls shortest of its target) is kept whole and
    * every other source downsamples to match. Pure arithmetic on the
    * (driver-small) per-source count map — unit-testable, and restated
    * op-for-op by the `sample_mix_sources` oracle (`least` over
    * `count/target`, then `target · scale / count`; all single IEEE ops,
    * so both engines derive bit-identical fractions).
    *
    * `targets` should be pre-normalized (summing to 1 exactly — pick
    * binary-exact weights like 0.5/0.25/0.25 when an oracle must mirror
    * the arithmetic).
    */
  def mixFractions(
      counts: Map[String, Long],
      targets: Seq[(String, Double)]): Map[String, Double] = {
    require(targets.nonEmpty && targets.forall(_._2 > 0), "mix: targets must be positive")
    targets.foreach { case (s, _) =>
      require(counts.contains(s), s"mix: source '$s' absent from corpus")
    }
    val scale = targets.map { case (s, w) => counts(s) / w }.min
    targets.map { case (s, w) => s -> w * scale / counts(s) }.toMap
  }

  /** Deterministically re-weight a multi-source corpus to a target mixture
    * (the "domain weights" step of training-data assembly — e.g. the
    * published Pile/LLaMA mixture tables): one counting pass (grouped on
    * the handful of source values — the collect is bounded by the source
    * cardinality), then a row-local seeded-hash filter per source. Sources
    * not named in `targets` are dropped.
    */
  def mixToTarget(
      df: DataFrame,
      keyCol: String,
      sourceCol: String,
      targets: Seq[(String, Double)],
      seed: Int = 42): DataFrame = {
    val counts = df.groupBy(col(s"`$sourceCol`")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    stratifiedHashSample(df, keyCol, sourceCol, mixFractions(counts, targets), seed)
  }

  /** Temperature re-weighting of a multi-source corpus (the multilingual
    * LM mixing rule — mBERT/XLM sample source i ∝ share_i^α with α < 1 to
    * lift small sources without drowning large ones): the α-powered
    * counts themselves become [[mixFractions]] target weights, so the
    * binding source (the one the temperature lifts most, i.e. the
    * smallest) is kept whole and every other source hash-downsamples
    * toward the tempered share. α = 0.5 (the common default) computes as
    * an exact IEEE `sqrt`, which is what lets the oracle restate the
    * kept-fraction arithmetic bit-for-bit; other α go through `pow`,
    * which SQL engines do not pin to the last ulp — use spec certification
    * there.
    *
    * Same scale shape as [[mixToTarget]]: one counting pass collapsed to
    * source cardinality (bounded collect), then a row-local seeded-hash
    * filter.
    */
  def mixTemperature(
      df: DataFrame,
      keyCol: String,
      sourceCol: String,
      alpha: Double = 0.5,
      seed: Int = 42): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"temperature alpha must be in (0, 1], got $alpha")
    val counts = df.groupBy(col(s"`$sourceCol`")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val weights = counts.toSeq.sortBy(_._1).map { case (src, c) =>
      src -> (if (alpha == 0.5) math.sqrt(c.toDouble) else math.pow(c.toDouble, alpha))
    }
    stratifiedHashSample(df, keyCol, sourceCol, mixFractions(counts, weights), seed)
  }

  /** The oracle-side restatement of [[hashUnit]] for a SQL engine. */
  def hashUnitSql(keyExpr: String, seed: Int): String =
    s"(${hashBits52Sql(keyExpr, seed)} / ${(1L << 52).toDouble})"

  /** The oracle-side restatement of [[hashBits52]]. */
  def hashBits52Sql(keyExpr: String, seed: Int): String =
    s"(('0x' || substr(md5('$seed' || ($keyExpr)::VARCHAR), 1, 13))::BIGINT)"

  /** Fill a per-source token budget deterministically: per `sourceCol`
    * value, documents are taken in seeded-hash order (the same
    * reproducible-on-any-cluster ordering contract as [[hashSample]],
    * ties broken by id) while the RUNNING token total stays within
    * `budget` — the "give me N tokens of domain X" step of training-corpus
    * assembly. The cut is a pure prefix of the hash order (the first
    * overflowing document and everything after it are excluded; no best-fit
    * reordering), so it restates as one SQL window.
    *
    * 100 TB shape: a naive per-source window is ONE sequential task per
    * source — unusable when a source is most of the corpus. Instead the
    * same two-phase prefix sum [[Packing.packConcatChunk]] rides: documents
    * shard into `numBuckets` hash-RANGE buckets (`floor(u·B)` — monotone in
    * `u`, so bucket order IS hash order), per-(source, bucket) subtotals
    * (a sources×B frame) turn into bucket offsets under one bounded window,
    * and each bucket's interior cumsum runs as its own task with the offset
    * added back — per-source parallelism B, identical totals to the global
    * window by monotonicity.
    *
    * Output: `(idCol, sourceCol, n_tok, cum_tok)` for the selected prefix.
    */
  def tokenBudgetSelect(
      df: DataFrame,
      idCol: String,
      sourceCol: String,
      tokenCount: Column,
      budget: Long,
      numBuckets: Int = 64,
      seed: Int = 42): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
    val id = col(s"`$idCol`")
    val src = col(s"`$sourceCol`")
    val keyed = df
      .select(id, src, tokenCount.cast("long").as("n_tok"))
      .where(col("n_tok") > 0)
      .withColumn("_u", hashUnit(id, seed))
      .withColumn("_bucket", floor(col("_u") * numBuckets).cast("long"))
    val wBuckets = Window.partitionBy("_src").orderBy("_b")
    val offsets = keyed
      .groupBy(src.as("_src"), col("_bucket").as("_b"))
      .agg(sum(col("n_tok")).as("_btok"))
      .withColumn("_offset", sum(col("_btok")).over(wBuckets) - col("_btok"))
      .select(col("_src"), col("_b"), col("_offset"))
    val wInBucket = Window.partitionBy(src, col("_bucket"))
      .orderBy(col("_u"), id)
    keyed
      .join(broadcast(offsets),
        // null-safe on the source key: a NULL source is its own budget
        // group (DuckDB's PARTITION BY source semantics); plain === would
        // null-reject those rows and silently diverge from the oracle
        (src <=> col("_src")) && col("_bucket") === col("_b"))
      .withColumn("cum_tok", col("_offset") + sum(col("n_tok")).over(wInBucket))
      .where(col("cum_tok") <= budget)
      .select(id, src, col("n_tok"), col("cum_tok"))
  }

  /** Per-source document cap — the RefinedWeb/C4-style "at most N
    * documents per domain" anti-domination step of corpus assembly (a
    * handful of boilerplate-heavy hosts otherwise dominate a web crawl):
    * keep each source's first `cap` documents in the seeded-hash order
    * (reproducible on any cluster, ties by id), drop the rest. This IS
    * [[tokenBudgetSelect]] with unit weights — a document cap is a token
    * budget where every document costs 1 — so the bucketed two-phase
    * prefix machinery (per-source parallelism `numBuckets`, provably ≡
    * the one-window form) rides unchanged; no new kernel, no per-source
    * sequential task.
    *
    * Output: `(idCol, sourceCol, rank_in_source)` — the kept prefix with
    * its 1-based per-source hash-order rank.
    */
  def perSourceCap(
      df: DataFrame,
      idCol: String,
      sourceCol: String,
      cap: Int,
      numBuckets: Int = 64,
      seed: Int = 42): DataFrame = {
    require(cap > 0, s"perSourceCap: cap must be positive, got $cap")
    tokenBudgetSelect(df, idCol, sourceCol, lit(1L), cap.toLong, numBuckets, seed)
      .select(col(s"`$idCol`"), col(s"`$sourceCol`"),
        col("cum_tok").as("rank_in_source"))
  }

  /** DSIR-style importance scores (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling" — public): score every raw
    * document by how much its hashed-n-gram distribution looks like a
    * TARGET slice of the corpus versus the raw corpus as a whole, then
    * select by the score. The published estimator is
    * `Σ_features log(p_target(f) / p_raw(f))` over hashed bigram features;
    * the integer-exact twin here replaces each log2 with the repo's
    * `ilog2(n+1) = length(bin(n+1))` discipline (see
    * [[graft.ops.NgramLm]]), so scores hash-match across engines:
    *
    * {{{
    * w(b)     = clip( ilog2p1(ct(b)) - ilog2p1(cr(b)) + S, ±clipBits )
    * S        = ilog2p1(Nraw) - ilog2p1(Ntarget)      (corpus normalizer)
    * bits     = Σ_{features of doc} w(bucket(feature))
    * bits_per_1k = 1000·bits / n_feats               (IEEE double, exact-
    *                                                  rounded identically
    *                                                  in any engine)
    * }}}
    *
    * where `ct`/`cr` are the target/raw occurrence counts of hash bucket
    * `b`, and features are analyzer bigrams hashed into `numBuckets`
    * buckets by the portable md5 hash ([[hashBits52]]) — hashing is what
    * keeps the model a FIXED-width table regardless of vocabulary size
    * (DSIR's own trick).
    *
    * 100 TB shape: one corpus exchange builds the model (output ≤
    * `numBuckets` rows — broadcastable at any corpus size, by
    * construction, not by a Zipf argument); totals ride a 1-row broadcast
    * cross join; scoring explodes features row-locally, joins the
    * broadcast model, and collapses by doc id with map-side partial
    * aggregation. The corpus is never shuffled by anything wider than its
    * own id. Two corpus SCANS total (model pass + scoring pass — scoring
    * cannot start before the model is whole, the same inherent two-pass
    * shape as [[graft.ops.TextAnalysis.boilerplateFilter]]); a run that
    * already persists the corpus columnar pays them as two cheap columnar
    * reads, and the streamed-model path
    * ([[graft.streaming.EventStreams.maintainImportanceModel]]) removes
    * the model pass from the serving DAG entirely.
    *
    * Output: `(idCol, carry…, n_feats, bits, bits_per_1k)` — one row per
    * document that has ≥1 bigram feature. Rank on `bits_per_1k` for top-k
    * selection, or feed [[importancePriority]] for proportional sampling.
    */
  def importanceScores(
      df: DataFrame,
      idCol: String,
      textCol: String,
      targetCond: Column,
      numBuckets: Int = 1024,
      clipBits: Int = 16,
      seed: Int = 7,
      carry: Seq[String] = Nil): DataFrame =
    importanceScoresAgainst(df, idCol, textCol,
      importanceWeights(
        importanceModel(df, textCol, targetCond, numBuckets, seed), clipBits),
      numBuckets, seed, carry)

  private def ilog2p1(c: Column): Column = length(bin(c + lit(1L))).cast("long")

  /** The hashed bigram bucket of one feature occurrence. */
  private def featureBucket(numBuckets: Int, seed: Int): Column =
    pmod(hashBits52(concat_ws(" ", col("_bg.w1"), col("_bg.w2")), seed),
      lit(numBuckets.toLong))

  /** The DSIR model: per hash bucket, raw occurrence count `cr` and
    * target-slice occurrence count `ct` — `(b, cr, ct)`, at most
    * `numBuckets` rows. This is the MERGEABLE piece: models of corpus
    * parts sum bucket-wise to the whole-corpus model (group-sum on `b`),
    * which is what lets [[graft.streaming.EventStreams
    * .maintainImportanceModel]] keep it fresh from a document stream.
    */
  def importanceModel(
      df: DataFrame,
      textCol: String,
      targetCond: Column,
      numBuckets: Int = 1024,
      seed: Int = 7): DataFrame = {
    require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
    df.select(targetCond.as("_tgt"),
        explode(NgramLm.bigramsCol(col(s"`$textCol`"))).as("_bg"))
      .withColumn("b", featureBucket(numBuckets, seed))
      .groupBy(col("b"))
      .agg(count(lit(1)).as("cr"),
        sum(when(col("_tgt"), 1L).otherwise(0L)).as("ct"))
  }

  /** Clipped integer weights from a model: `(b, w)` with the 1-row corpus
    * normalizer riding a broadcast cross join.
    */
  def importanceWeights(model: DataFrame, clipBits: Int = 16): DataFrame = {
    require(clipBits > 0, s"clipBits must be positive, got $clipBits")
    val totals = model.agg(sum("cr").as("_nr"), sum("ct").as("_nt"))
    model
      .crossJoin(broadcast(totals))
      .withColumn("w", greatest(lit(-clipBits.toLong), least(lit(clipBits.toLong),
        ilog2p1(col("ct")) - ilog2p1(col("cr")) +
          ilog2p1(col("_nr")) - ilog2p1(col("_nt")))))
      .select(col("b"), col("w"))
  }

  /** Score documents against a given weight table (which need not come
    * from the same frame — the streamed corpus-so-far model serves here):
    * broadcast join over the row-local feature stream, one doc-id
    * aggregation.
    */
  def importanceScoresAgainst(
      df: DataFrame,
      idCol: String,
      textCol: String,
      weights: DataFrame,
      numBuckets: Int = 1024,
      seed: Int = 7,
      carry: Seq[String] = Nil): DataFrame = {
    require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
    val id = col(s"`$idCol`")
    val carried = carry.map(c => col(s"`$c`"))
    df.select(id +: explode(NgramLm.bigramsCol(col(s"`$textCol`"))).as("_bg") +:
        carried: _*)
      .withColumn("b", featureBucket(numBuckets, seed))
      .join(broadcast(weights), Seq("b"))
      .groupBy(id +: carried: _*)
      .agg(count(lit(1)).as("n_feats"), sum(col("w")).as("bits"))
      .withColumn("bits_per_1k",
        (lit(1000.0) * col("bits")) / col("n_feats").cast("double"))
  }

  /** Weighted-sampling priority over importance scores: `pri = w / u` with
    * a positive linear weight `w = bits_per_1k + shift` and the seeded
    * unit hash `u` of the id — priority sampling (Duffield, Lund & Thorup
    * 2007, public): taking the top-k rows by `pri` draws documents with
    * probability proportional to `w` (without replacement, deterministic,
    * reproducible on any cluster). Pure IEEE divisions of exactly
    * representable values, so priorities are bit-identical cross-engine —
    * no transcendental in sight (the reason the weight is linear in bits
    * rather than DSIR's `exp(score)`: exponentiating would demand
    * cross-engine `exp`/`ln`, which IEEE 754 does not pin down).
    */
  def importancePriority(
      scored: DataFrame,
      idCol: String,
      shift: Double,
      seed: Int = 11): DataFrame = {
    require(shift > 0, s"shift must be positive, got $shift")
    val id = col(s"`$idCol`")
    scored
      .withColumn("w_lin", col("bits_per_1k") + lit(shift))
      .withColumn("pri", col("w_lin") / hashUnit(id, seed))
  }
}
