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
}
