package graft.query

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** function_score scoring functions: hand-valued decay curves (the
  * spec-certified gauss/exp forms and the oracled linear form) and the
  * field_value_factor modifiers.
  */
class ScoringSpec extends SparkSpecBase {
  import spark.implicits._

  private def score(c: org.apache.spark.sql.Column, v: Double): Double =
    Seq(v).toDF("v").select(c.as("s")).as[Double].collect().head

  test("linear decay: 1 inside offset, decay at offset+scale, 0 past the apex") {
    def lin(v: Double) = score(Scoring.linearDecay(col("v"),
      origin = 100, scale = 50, offset = 10, decay = 0.5), v)
    assert(lin(100.0) === 1.0)
    assert(lin(105.0) === 1.0) // inside the offset plateau
    assert(lin(110.0) === 1.0) // plateau edge
    assert(lin(160.0) === 0.5) // |v-origin| = offset + scale → decay
    assert(lin(40.0) === 0.5) // symmetric
    assert(lin(500.0) === 0.0) // past the apex clamps to 0
    intercept[IllegalArgumentException](
      Scoring.linearDecay(col("v"), 0, scale = -1))
    intercept[IllegalArgumentException](
      Scoring.linearDecay(col("v"), 0, scale = 1, decay = 1.0))
  }

  test("gauss decay: 1 at origin, decay at scale, monotone, never 0") {
    def g(v: Double) = score(Scoring.gaussDecay(col("v"),
      origin = 0, scale = 10, decay = 0.5), v)
    assert(g(0.0) === 1.0)
    assert(math.abs(g(10.0) - 0.5) < 1e-12) // exp(ln(0.5)) at the scale point
    assert(g(5.0) > g(10.0) && g(10.0) > g(20.0))
    assert(g(100.0) > 0.0) // the bell never clamps
    // half-at-scale for ANY decay target
    assert(math.abs(score(Scoring.gaussDecay(col("v"), 0, 10, decay = 0.1), 10.0)
      - 0.1) < 1e-12)
  }

  test("exp decay: 1 at origin, decay at scale, heavier tail than gauss") {
    def e(v: Double) = score(Scoring.expDecay(col("v"),
      origin = 0, scale = 10, decay = 0.5), v)
    def g(v: Double) = score(Scoring.gaussDecay(col("v"),
      origin = 0, scale = 10, decay = 0.5), v)
    assert(e(0.0) === 1.0)
    assert(math.abs(e(10.0) - 0.5) < 1e-12)
    assert(e(30.0) > g(30.0), "exp must out-tail gauss far from the origin")
    // and fall off FASTER near the origin
    assert(e(3.0) < g(3.0))
  }

  test("field_value_factor: modifiers, missing substitution, loud unknown") {
    assert(score(Scoring.fieldValueFactor(col("v"), factor = 2.0), 3.0) === 6.0)
    assert(score(Scoring.fieldValueFactor(col("v"), 1.0, "sqrt"), 16.0) === 4.0)
    assert(score(Scoring.fieldValueFactor(col("v"), 1.0, "log1p"), 0.0) === 0.0)
    val missing = Seq(Option.empty[Double]).toDF("v")
      .select(Scoring.fieldValueFactor(col("v"), 1.0, "none", missing = 7.0).as("s"))
      .as[Double].collect().head
    assert(missing === 7.0)
    intercept[IllegalArgumentException](
      Scoring.fieldValueFactor(col("v"), 1.0, "square"))
  }

  // (v, flag) rows for the combine-mode tests: two filtered functions —
  // f1 = 2·v on flag, f2 = 3 (weight-only) unfiltered, f3 = 10·v on v>1.
  private def modes(v: Double, flag: Boolean, scoreMode: String,
      boostMode: String = "multiply", maxBoost: Double = Double.PositiveInfinity,
      q: Double = 5.0): Double = {
    import Scoring.ScoreFunction
    Seq((v, flag)).toDF("v", "flag")
      .select(Scoring.functionScore(lit(q),
        Seq(
          ScoreFunction(col("v"), weight = 2.0, filter = Some(col("flag"))),
          ScoreFunction(lit(1.0), weight = 3.0),
          ScoreFunction(lit(10.0) * col("v"), filter = Some(col("v") > 1.0))),
        scoreMode, boostMode, maxBoost).as("s"))
      .as[Double].collect().head
  }

  test("score_mode folds matching functions: sum/multiply/avg/max/min/first") {
    // v=2, flag=true: f1=2·2=4, f2=3, f3=10·2=20 all match
    assert(modes(2.0, flag = true, "sum") === 5.0 * (4.0 + 3.0 + 20.0))
    assert(modes(2.0, flag = true, "multiply") === 5.0 * (4.0 * 3.0 * 20.0))
    // weighted avg: Σwᵢfᵢ/Σwᵢ = (4+3+20)/(2+3+1)
    assert(modes(2.0, flag = true, "avg") === 5.0 * ((4.0 + 3.0 + 20.0) / 6.0))
    assert(modes(2.0, flag = true, "max") === 5.0 * 20.0)
    assert(modes(2.0, flag = true, "min") === 5.0 * 3.0)
    assert(modes(2.0, flag = true, "first") === 5.0 * 4.0)
    // v=0.5, flag=false: only the weight-only f2 matches
    assert(modes(0.5, flag = false, "sum") === 5.0 * 3.0)
    assert(modes(0.5, flag = false, "max") === 5.0 * 3.0)
    assert(modes(0.5, flag = false, "first") === 5.0 * 3.0)
    intercept[IllegalArgumentException](modes(1.0, flag = true, "median"))
  }

  test("no matching function leaves the query score unmodified under multiply") {
    import Scoring.ScoreFunction
    val out = Seq((0.5, false)).toDF("v", "flag")
      .select(Scoring.functionScore(lit(5.0),
        Seq(ScoreFunction(col("v"), weight = 2.0, filter = Some(col("flag")))),
        "sum", "multiply").as("s"))
      .as[Double].collect().head
    assert(out === 5.0) // combined factor 1, the ES pass-through contract
  }

  test("max_boost caps the combined factor; boost_mode merges with the query") {
    // sum = 27 capped at 10 → 5·10
    assert(modes(2.0, flag = true, "sum", maxBoost = 10.0) === 50.0)
    assert(modes(2.0, flag = true, "sum", boostMode = "replace") === 27.0)
    assert(modes(2.0, flag = true, "sum", boostMode = "sum") === 5.0 + 27.0)
    assert(modes(2.0, flag = true, "sum", boostMode = "avg") === (5.0 + 27.0) / 2.0)
    assert(modes(2.0, flag = true, "sum", boostMode = "max") === 27.0)
    assert(modes(2.0, flag = true, "sum", boostMode = "min") === 5.0)
    intercept[IllegalArgumentException](
      modes(1.0, flag = true, "sum", boostMode = "xor"))
    intercept[IllegalArgumentException](Scoring.combine(Nil, "sum"))
  }

  test("rank_feature saturation: pivot-half point, monotone, zero on missing") {
    def sat(v: java.lang.Double) =
      Seq(Option(v).map(_.doubleValue)).toDF("v")
        .select(Scoring.rankFeatureSaturation(col("v"), pivot = 10.0).as("s"))
        .as[Double].collect().head
    assert(sat(10.0) === 0.5) // v == pivot → exactly half
    assert(sat(30.0) === 0.75) // 30/40
    assert(sat(5.0) < sat(10.0) && sat(10.0) < sat(100.0)) // monotone
    assert(sat(0.0) === 0.0) // non-positive feature scores 0
    assert(sat(-3.0) === 0.0)
    assert(sat(null) === 0.0) // ES skips docs without the feature
    // boost scales linearly
    assert(Seq(10.0).toDF("v")
      .select(Scoring.rankFeatureSaturation(col("v"), 10.0, boost = 4.0).as("s"))
      .as[Double].collect().head === 2.0)
    intercept[IllegalArgumentException](
      Scoring.rankFeatureSaturation(col("v"), pivot = 0.0))
  }

  test("rank_feature log: ln(sf·v + 1), zero on missing/non-positive") {
    def lg(v: java.lang.Double) =
      Seq(Option(v).map(_.doubleValue)).toDF("v")
        .select(Scoring.rankFeatureLog(col("v"), scalingFactor = 2.0).as("s"))
        .as[Double].collect().head
    assert(lg(0.5) === math.log(2.0 * 0.5 + 1.0)) // ln 2
    assert(lg(4.5) === math.log(10.0))
    assert(lg(0.0) === 0.0 && lg(null) === 0.0)
    intercept[IllegalArgumentException](
      Scoring.rankFeatureLog(col("v"), scalingFactor = 0.0))
  }

  test("distance_feature: boost at origin, half at one pivot away, symmetric") {
    def df(v: java.lang.Double) =
      Seq(Option(v).map(_.doubleValue)).toDF("v")
        .select(Scoring.distanceFeature(col("v"), origin = 100.0,
          pivot = 20.0, boost = 2.0).as("s"))
        .as[Double].collect().head
    assert(df(100.0) === 2.0) // at the origin: full boost
    assert(df(120.0) === 1.0) // one pivot away: half
    assert(df(80.0) === 1.0) // symmetric
    assert(df(160.0) === 2.0 * 20.0 / 80.0) // the published formula
    assert(df(null) === 0.0) // missing values skipped
    intercept[IllegalArgumentException](
      Scoring.distanceFeature(col("v"), 0.0, pivot = -1.0))
  }

  test("boosting: negative matches demote (never exclude), nulls don't match") {
    val rows = Seq((1L, 8.0, Some(true)), (2L, 6.0, Some(false)),
      (3L, 4.0, None)).toDF("id", "s", "neg")
    val got = rows.select(col("id"),
        Scoring.boosting(col("s"), col("neg"), negativeBoost = 0.25).as("b"))
      .as[(Long, Double)].collect().sortBy(_._1).toSeq
    // doc 1 demoted below both others — present, not excluded; the null
    // negative result counts as non-matching (three-valued discipline)
    assert(got === Seq((1L, 2.0), (2L, 6.0), (3L, 4.0)))
    intercept[IllegalArgumentException](
      Scoring.boosting(col("s"), col("neg"), negativeBoost = 1.0))
    intercept[IllegalArgumentException](
      Scoring.boosting(col("s"), col("neg"), negativeBoost = -0.1))
  }

  test("constantScore: every match scores exactly the boost literal") {
    val got = Seq(1L, 2L).toDF("id")
      .select(Scoring.constantScore(1.5).as("s")).as[Double].collect().toSeq
    assert(got === Seq(1.5, 1.5))
  }
}
