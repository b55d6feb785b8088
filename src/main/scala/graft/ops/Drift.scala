package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus drift detection — the monitoring op every production data
  * pipeline runs between corpus snapshots (yesterday's crawl vs today's,
  * the training mix vs the serving distribution): bucket a feature on
  * both sides, compare the bucket SHARE distributions. Public standard
  * metrics, chosen for cross-engine exactness:
  *
  *  - total-variation distance `TVD = Σ|p−q| / 2` ∈ [0, 1] — pure
  *    subtraction/abs/sum;
  *  - the symmetric (Jeffreys) chi-square `χ²_sym = Σ (p−q)²/(p+q)` —
  *    pure arithmetic and well-defined when a bucket is empty on one
  *    side;
  *  - PSI `Σ (p−q)·ln(p/q)`, the ML-ops monitoring standard, computed
  *    over CO-PRESENT buckets only — `ln(p/q)` blows up on empty
  *    buckets, and the usual ε-smoothing is a knob, not a definition:
  *    appearing/vanishing buckets already scream through `tvd` and
  *    `n_buckets`, so the restriction loses no signal and keeps the
  *    statistic exact (the t_test library-`ln` precedent covers the
  *    transcendental; `round(·, 6)` covers the last ulp).
  *
  * Both engines sum per-bucket doubles in nondeterministic order, so the
  * emitted metrics are rounded to 6 decimals (the dictionary-stats
  * precedent) — drift thresholds live at the second decimal, six is
  * far inside any decision margin.
  *
  * 100 TB shape: each side collapses to its bucket histogram in one
  * map-side-combined aggregation (output = bucket cardinality, a schema
  * property); the compare is a full-outer join of two histogram frames
  * plus a one-row aggregate. The corpus is never shuffled by anything
  * wider than the bucket key, and never joined row-to-row.
  */
object Drift {

  /** Bucket shares of one side: `(bucket, share)` with share = cnt/total.
    * Null buckets form their own bucket (a feature going null IS drift).
    */
  def bucketShares(df: DataFrame, bucket: Column): DataFrame = {
    val counts = df.groupBy(bucket.as("bucket"))
      .agg(count(lit(1)).as("_n"))
    counts
      .crossJoin(broadcast(counts.agg(sum("_n").as("_total"))))
      .select(col("bucket"),
        (col("_n").cast("double") / col("_total").cast("double")).as("share"))
  }

  /** Drift between two snapshots over one bucketing: a single row
    * `(n_buckets, tvd, chi2_sym)`. `n_buckets` counts buckets present on
    * EITHER side (appearing/vanishing buckets are the loudest drift).
    */
  def featureDrift(a: DataFrame, b: DataFrame, bucket: Column): DataFrame = {
    val pa = bucketShares(a, bucket).withColumnRenamed("share", "p")
    val pb = bucketShares(b, bucket).withColumnRenamed("share", "q")
    pa.join(pb, Seq("bucket"), "full_outer")
      .select(coalesce(col("p"), lit(0.0)).as("p"),
        coalesce(col("q"), lit(0.0)).as("q"))
      .agg(
        count(lit(1)).as("n_buckets"),
        round(sum(abs(col("p") - col("q"))) / 2.0, 6).as("tvd"),
        // (p−q)·(p−q), not pow(·, 2): Math.pow is allowed a ulp of slack,
        // plain multiplication is exact-rounded in every engine
        round(sum((col("p") - col("q")) * (col("p") - col("q")) /
          (col("p") + col("q"))), 6).as("chi2_sym"),
        // PSI (the ML-ops monitoring standard) over CO-PRESENT buckets —
        // appearing/vanishing buckets already scream through tvd and
        // n_buckets, and skipping them keeps the statistic epsilon-free
        // (the usual smoothing constant is a knob, not a definition)
        round(sum(when(col("p") > 0 && col("q") > 0,
          (col("p") - col("q")) * log(col("p") / col("q"))).otherwise(lit(0.0))),
          6).as("psi"))
  }

  /** [[featureDrift]] across several named bucketings in one frame:
    * `(feature, n_buckets, tvd, chi2_sym)`, one row per feature — the
    * drift DASHBOARD between two corpus snapshots.
    *
    * SINGLE-PASS per side regardless of feature count: every row explodes
    * to its F `(feature, bucket)` pairs (buckets carried as strings, with
    * floating -0.0 normalized to +0.0 first so the rendering respects the
    * native grouping equivalence — see `hist`) and ONE map-side-combined
    * aggregation builds all F
    * histograms — 2 corpus scans total where the per-feature form costs
    * 2F (PlanSpec pins the scan count). Everything downstream operates on
    * schema-bounded histogram frames. Join/metric arithmetic is identical
    * to [[featureDrift]], including the NULL-bucket join convention (null
    * keys never match — a null bucket present on both sides counts twice),
    * so the per-feature rows hash-match the unioned form.
    */
  def driftReport(
      a: DataFrame, b: DataFrame,
      features: Seq[(String, Column)]): DataFrame = {
    require(features.nonEmpty, "driftReport: at least one feature")
    // The string rendering is injective UP TO the grouping equivalence
    // only after one repair: native groupBy normalizes -0.0 == 0.0 for
    // float/double buckets but renders them as distinct strings, so a
    // floating bucket gets `+ 0.0` (IEEE: -0.0 + 0.0 = +0.0, every other
    // value unchanged) before the cast. Resolved per side from the
    // frame's own schema; non-floating types need no repair.
    def hist(df: DataFrame): DataFrame = {
      import org.apache.spark.sql.types.{DoubleType, FloatType}
      val normalized = features.map { case (name, bucket) =>
        df.select(bucket).schema.head.dataType match {
          case DoubleType | FloatType => (name, bucket + lit(0.0))
          case _ => (name, bucket)
        }
      }
      df.select(explode(array(normalized.map { case (name, bucket) =>
          struct(lit(name).as("feature"), bucket.cast("string").as("bucket"))
        }: _*)).as("fb"))
        .groupBy(col("fb.feature").as("feature"), col("fb.bucket").as("bucket"))
        .agg(count(lit(1)).as("_n"))
    }
    // Per-feature totals come from a WINDOW over the histogram — the
    // histogram is already partitioned by its group keys and
    // schema-bounded, so the window is a local pass over ≤ Σ|buckets|
    // rows and the plan holds exactly one corpus scan per side (a
    // self-join for totals would re-derive the aggregation subtree —
    // 2 scans per side before runtime exchange reuse).
    def shares(h: DataFrame, out: String): DataFrame =
      h.select(col("feature"), col("bucket"),
        (col("_n").cast("double") /
          sum("_n").over(Window.partitionBy("feature")).cast("double")).as(out))
    shares(hist(a), "p")
      .join(shares(hist(b), "q"), Seq("feature", "bucket"), "full_outer")
      .select(col("feature"),
        coalesce(col("p"), lit(0.0)).as("p"),
        coalesce(col("q"), lit(0.0)).as("q"))
      .groupBy("feature")
      .agg(
        count(lit(1)).as("n_buckets"),
        round(sum(abs(col("p") - col("q"))) / 2.0, 6).as("tvd"),
        round(sum((col("p") - col("q")) * (col("p") - col("q")) /
          (col("p") + col("q"))), 6).as("chi2_sym"),
        round(sum(when(col("p") > 0 && col("q") > 0,
          (col("p") - col("q")) * log(col("p") / col("q"))).otherwise(lit(0.0))),
          6).as("psi"))
  }

  /** Snapshot diff — the row-level complement of the distributional
    * [[driftReport]]: which documents were ADDED, REMOVED, or CHANGED
    * between two corpus versions (the audit a data-versioning layer
    * answers before a retrain: "what actually moved?"). Rows are matched
    * by `idCol`; change detection compares `md5(fingerprint expression)`
    * — portable, content-addressed, never a full-text compare across the
    * join. Unchanged rows are dropped (the interesting set is the delta;
    * counts per status are one `groupBy` away).
    *
    * Output: `(idCol, status)` with status ∈ {added, removed, changed},
    * ordered by the caller. Scale shape: ONE hash-partitioned full-outer
    * join on the id key, fingerprints reduced map-side — nothing wider
    * than the id exchange, no text shuffled.
    */
  def snapshotDiff(
      before: DataFrame, after: DataFrame,
      idCol: String, fingerprint: Column): DataFrame = {
    val b = before.select(col(s"`$idCol`"), md5(fingerprint.cast("string")).as("_fb"))
    val a = after.select(col(s"`$idCol`"), md5(fingerprint.cast("string")).as("_fa"))
    b.join(a, Seq(idCol), "full_outer")
      .withColumn("status",
        when(col("_fb").isNull, lit("added"))
          .when(col("_fa").isNull, lit("removed"))
          .when(col("_fb") =!= col("_fa"), lit("changed")))
      .where(col("status").isNotNull)
      .select(col(s"`$idCol`"), col("status"))
  }
}
