package graft.query

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** ES `function_score` scoring functions — the relevance-shaping tier
  * (freshness boosts, distance decay, popularity factors) every ranked
  * search deployment bolts onto its retriever. All row-local fixed IEEE
  * trees over a numeric column; the linear decay is pure arithmetic and
  * fully SQL-restateable, while the gauss/exp forms go through `exp()`
  * (whose last-ulp rounding is libm-specific, so those two are
  * spec-certified with hand values rather than cross-engine hashed —
  * the `mm_feature_stats` discipline).
  */
object Scoring {

  /** ES linear decay: `max(0, (s − max(0, |v − origin| − offset)) / s)`
    * with `s = scale / (1 − decay)` — score 1 inside `offset` of
    * `origin`, exactly `decay` at `offset + scale`, 0 beyond the apex.
    * The divisor is precomputed once driver-side so both engines evaluate
    * the identical literal.
    */
  def linearDecay(v: Column, origin: Double, scale: Double,
      offset: Double = 0.0, decay: Double = 0.5): Column = {
    require(scale > 0, s"linearDecay: scale must be > 0, got $scale")
    require(decay > 0 && decay < 1, s"linearDecay: decay must be in (0,1), got $decay")
    val s = scale / (1.0 - decay)
    greatest(lit(0.0),
      (lit(s) - greatest(lit(0.0), abs(v - lit(origin)) - lit(offset))) / lit(s))
  }

  /** ES gauss decay: `exp(−max(0, |v−origin|−offset)² / (2σ²))` with
    * `σ² = −scale² / (2·ln(decay))` — the smooth bell. Spec-certified
    * (see class doc).
    */
  def gaussDecay(v: Column, origin: Double, scale: Double,
      offset: Double = 0.0, decay: Double = 0.5): Column = {
    require(scale > 0 && decay > 0 && decay < 1, "gaussDecay: bad scale/decay")
    val sigma2 = -scale * scale / (2.0 * math.log(decay))
    val d = greatest(lit(0.0), abs(v - lit(origin)) - lit(offset))
    exp((d * d) / lit(-2.0 * sigma2))
  }

  /** ES exp decay: `exp(λ·max(0, |v−origin|−offset))` with
    * `λ = ln(decay)/scale` — the heavy-tailed form. Spec-certified.
    */
  def expDecay(v: Column, origin: Double, scale: Double,
      offset: Double = 0.0, decay: Double = 0.5): Column = {
    require(scale > 0 && decay > 0 && decay < 1, "expDecay: bad scale/decay")
    val lambda = math.log(decay) / scale
    exp(greatest(lit(0.0), abs(v - lit(origin)) - lit(offset)) * lit(lambda))
  }

  /** One function inside a `function_score` composition: a score column
    * (any [[Scoring]] kernel, or `lit(1.0)` for ES's weight-only
    * function), a `weight` multiplier, and an optional `filter` — the
    * function applies only to documents the filter matches (ES's
    * filtered-functions array). Null filter results count as non-matching
    * (the [[FilterSpec]] three-valued-logic discipline).
    */
  final case class ScoreFunction(score: Column, weight: Double = 1.0,
      filter: Option[Column] = None)

  /** Combine several [[ScoreFunction]]s under an ES `score_mode` —
    * `multiply` (default) / `sum` / `avg` / `max` / `min` / `first` —
    * over the MATCHING functions per document. Each matching function
    * contributes `weight · score`; `avg` is the ES weighted average
    * `Σ(wᵢ·fᵢ)/Σwᵢ`; `first` takes the first matching function in the
    * given order. When NO function matches a document the combined factor
    * is 1 (the ES contract: the query score passes through unmodified
    * under `boost_mode: multiply`). Fixed left-fold association in the
    * given function order — the tree the SQL oracle restates.
    */
  def combine(functions: Seq[ScoreFunction],
      scoreMode: String = "multiply"): Column = {
    require(functions.nonEmpty, "function_score: no functions")
    val parts = functions.map { f =>
      val m = f.filter.map(c => coalesce(c, lit(false))).getOrElse(lit(true))
      (m, lit(f.weight) * f.score, f.weight)
    }
    val anyMatch = parts.map(_._1).reduce(_ || _)
    val combined = scoreMode match {
      case "multiply" =>
        parts.map { case (m, v, _) => when(m, v).otherwise(lit(1.0)) }.reduce(_ * _)
      case "sum" =>
        parts.map { case (m, v, _) => when(m, v).otherwise(lit(0.0)) }.reduce(_ + _)
      case "avg" =>
        val num = parts.map { case (m, v, _) => when(m, v).otherwise(lit(0.0)) }.reduce(_ + _)
        val den = parts.map { case (m, _, w) => when(m, lit(w)).otherwise(lit(0.0)) }.reduce(_ + _)
        num / den
      case "max" =>
        parts.map { case (m, v, _) => when(m, v) }.reduce((a, b) => greatest(a, b))
      case "min" =>
        parts.map { case (m, v, _) => when(m, v) }.reduce((a, b) => least(a, b))
      case "first" =>
        parts.foldRight(lit(1.0)) { case ((m, v, _), acc) => when(m, v).otherwise(acc) }
      case other => throw new IllegalArgumentException(
        s"function_score: unsupported score_mode <$other> " +
          "(multiply|sum|avg|max|min|first)")
    }
    when(anyMatch, combined).otherwise(lit(1.0))
  }

  /** Full ES `function_score`: [[combine]] the functions under
    * `scoreMode`, cap at `maxBoost` (ES default: unbounded), then merge
    * with the query score under `boostMode` — `multiply` (default) /
    * `replace` / `sum` / `avg` / `max` / `min`. Row-local fixed IEEE
    * trees throughout; oracles restate the same CASE/greatest/least
    * algebra.
    */
  def functionScore(queryScore: Column, functions: Seq[ScoreFunction],
      scoreMode: String = "multiply", boostMode: String = "multiply",
      maxBoost: Double = Double.PositiveInfinity): Column = {
    require(!maxBoost.isNaN, "function_score: max_boost is NaN")
    val f = least(combine(functions, scoreMode), lit(maxBoost))
    boostMode match {
      case "multiply" => queryScore * f
      case "replace" => f
      case "sum" => queryScore + f
      case "avg" => (queryScore + f) / lit(2.0)
      case "max" => greatest(queryScore, f)
      case "min" => least(queryScore, f)
      case other => throw new IllegalArgumentException(
        s"function_score: unsupported boost_mode <$other> " +
          "(multiply|replace|sum|avg|max|min)")
    }
  }

  /** ES `field_value_factor`: `factor · modifier(coalesce(v, missing))`.
    * Supported modifiers: `none`, `log1p` (ln(1+v)), `sqrt` — the three
    * the popularity-boost idiom actually uses. `log1p`/`sqrt` are
    * correctly-rounded in both engines (unlike bare `exp`), so this one
    * DOES oracle.
    */
  def fieldValueFactor(v: Column, factor: Double = 1.0,
      modifier: String = "none", missing: Double = 0.0): Column = {
    val base = coalesce(v.cast("double"), lit(missing))
    val m = modifier match {
      case "none" => base
      case "log1p" => log1p(base)
      case "sqrt" => sqrt(base)
      case other => throw new IllegalArgumentException(
        s"fieldValueFactor: unsupported modifier <$other> (none|log1p|sqrt)")
    }
    lit(factor) * m
  }

  /** ES `function_score` `random_score` with `seed` + `field`:
    * deterministic pseudo-random in [0, 1) — ES hashes the seed with the
    * field's value so the "random" order is reproducible across pages
    * and replicas; this restates it as the portable seeded md5 unit hash
    * ([[graft.ops.Sampling.hashUnit]]), which carries the same contract
    * (same seed + same key → same score anywhere, including the SQL
    * oracle). The deterministically-shuffled sample page idiom.
    */
  def randomScore(field: Column, seed: Int): Column =
    graft.ops.Sampling.hashUnit(field, seed)

  /** ES `rank_feature` query, `saturation` function:
    * `boost · v / (v + pivot)` — the sub-linear popularity/quality boost
    * (pagerank, url_length, …) Lucene computes from the rank-feature
    * index. Pure division — oracle-exact. Non-positive / missing feature
    * values score 0 (ES skips docs without the feature; a filter-less
    * scan surfaces them as zero so callers can `where(score > 0)`).
    */
  def rankFeatureSaturation(v: Column, pivot: Double,
      boost: Double = 1.0): Column = {
    require(pivot > 0, s"rank_feature saturation: pivot must be > 0, got $pivot")
    val x = v.cast("double")
    when(x.isNotNull && x > 0, lit(boost) * x / (x + lit(pivot)))
      .otherwise(lit(0.0))
  }

  /** ES `rank_feature` query, `log` function:
    * `boost · ln(scaling_factor · v + 1)` — the unbounded-growth variant.
    * `ln` is correctly-rounded at the driver compare's 9-decimal
    * tolerance (the `fieldValueFactor` log1p discipline), so this
    * oracles.
    */
  def rankFeatureLog(v: Column, scalingFactor: Double,
      boost: Double = 1.0): Column = {
    require(scalingFactor > 0,
      s"rank_feature log: scaling_factor must be > 0, got $scalingFactor")
    val x = v.cast("double")
    when(x.isNotNull && x > 0, lit(boost) * log(lit(scalingFactor) * x + lit(1.0)))
      .otherwise(lit(0.0))
  }

  /** ES `distance_feature` query: `boost · pivot / (pivot + dist)` with
    * `dist = |v − origin|` — recency/proximity boosting over a numeric or
    * date field (dates: pass µs/ms integers cast to double; the algebra
    * is exact either way). Score is `boost` AT the origin, `boost/2` at
    * one pivot away — pure arithmetic, oracle-exact. Missing values score
    * 0 (ES skips them).
    */
  def distanceFeature(v: Column, origin: Double, pivot: Double,
      boost: Double = 1.0): Column = {
    require(pivot > 0, s"distance_feature: pivot must be > 0, got $pivot")
    val dist = abs(v.cast("double") - lit(origin))
    when(v.isNotNull, lit(boost) * lit(pivot) / (lit(pivot) + dist))
      .otherwise(lit(0.0))
  }

  /** ES `boosting` query: documents matching the NEGATIVE query are
    * DEMOTED, not excluded — `score = positive_score ·
    * (negative matches ? negative_boost : 1)` — the "relevant but about
    * apples-the-company" idiom ES built the query for. `score` is the
    * positive query's score column (BM25 or any kernel here);
    * `negativeMatches` any compiled [[FilterSpec]]-style predicate. Null
    * predicate results count as non-matching (the three-valued-logic
    * discipline). One `when` over two columns — row-local, oracle-exact
    * (a single IEEE multiply on the demoted branch).
    */
  def boosting(score: Column, negativeMatches: Column,
      negativeBoost: Double): Column = {
    require(negativeBoost >= 0 && negativeBoost < 1,
      s"boosting: negative_boost must be in [0,1) — ≥1 would not demote, " +
        s"got $negativeBoost")
    when(coalesce(negativeMatches, lit(false)), score * lit(negativeBoost))
      .otherwise(score)
  }

  /** ES `constant_score` query: every document matching the wrapped
    * filter scores exactly `boost` — the "I want filter semantics but a
    * scored hit list" wrapper (no tf/idf, no per-doc variation; ES uses
    * it to cache the inner filter). The score column is just the
    * literal; the match set is the caller's `where(pred)`. Provided as
    * the named pair so the route/DSL layer has a single vocabulary.
    */
  def constantScore(boost: Double = 1.0): Column = lit(boost)
}
