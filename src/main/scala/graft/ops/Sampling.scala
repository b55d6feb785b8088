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
      splitCol: String = "split"): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0), "weights must be positive")
    val total = weights.map(_._2).sum
    val u = hashUnit(col(s"`$keyCol`"), seed)
    val cums = weights.scanLeft(0.0)(_ + _._2 / total).tail
    val expr = weights.zip(cums).init.foldRight(lit(weights.last._1): Column) {
      case (((name, _), hi), acc) => when(u < hi, name).otherwise(acc)
    }
    df.withColumn(splitCol, expr)
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
}
