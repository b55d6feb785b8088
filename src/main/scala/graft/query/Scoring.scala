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
}
