package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Drift metrics: hand-computed TVD / symmetric chi-square / PSI,
  * identity on identical snapshots, appearing-bucket handling, report
  * shape.
  */
class DriftSpec extends SparkSpecBase {
  import spark.implicits._

  private def a = Seq((1L, "x"), (2L, "x"), (3L, "y"), (4L, "y")).toDF("id", "k")
  private def b = Seq((5L, "x"), (6L, "y"), (7L, "y"), (8L, "z")).toDF("id", "k")

  test("featureDrift: hand-computed TVD, chi2, and PSI; bucket on either side counts") {
    val row = Drift.featureDrift(a, b, col("k"))
      .as[(Long, Double, Double, Double)].head()
    // p = (.5, .5, 0), q = (.25, .5, .25):
    // TVD = (.25 + 0 + .25)/2 = .25
    // chi2 = .0625/.75 + 0 + .0625/.25 = .083333 + .25 = .333333
    // PSI over co-present buckets only (z is absent from p):
    //   (.5-.25)·ln(.5/.25) + 0 = .25·ln2 = .173287
    assert(row._1 === 3L)
    assert(row._2 === 0.25)
    assert(row._3 === 0.333333)
    assert(row._4 === math.round(0.25 * math.log(2.0) * 1e6) / 1e6)
  }

  test("identical snapshots drift by exactly zero") {
    val row = Drift.featureDrift(a, a, col("k"))
      .as[(Long, Double, Double, Double)].head()
    assert(row === ((2L, 0.0, 0.0, 0.0)))
  }

  test("null buckets are their own bucket — a feature going null is drift") {
    val withNull = Seq((1L, "x"), (2L, null.asInstanceOf[String])).toDF("id", "k")
    val row = Drift.featureDrift(a, withNull, col("k"))
      .as[(Long, Double, Double, Double)].head()
    // q has buckets x (.5) and NULL (.5); p has x (.5), y (.5)
    assert(row._1 === 3L && row._2 === 0.5)
    // only x is co-present and its shares agree -> PSI 0 while TVD screams
    assert(row._4 === 0.0)
  }

  test("driftReport emits one row per named feature") {
    val out = Drift.driftReport(a, b, Seq(
        "k" -> col("k"), "parity" -> (col("id") % 2)))
      .orderBy("feature")
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    assert(out.map(_._1) === Seq("k", "parity"))
    assert(out.head._3 === 0.25)
  }

  test("single-pass driftReport rows equal the per-feature featureDrift union") {
    val feats = Seq("k" -> col("k"), "parity" -> (col("id") % 2),
      "idlo" -> (col("id") < 4))
    val onePass = Drift.driftReport(a, b, feats).orderBy("feature")
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    val union = feats.map { case (name, bucket) =>
      val r = Drift.featureDrift(a, b, bucket)
        .as[(Long, Double, Double, Double)].head()
      (name, r._1, r._2, r._3, r._4)
    }.sortBy(_._1)
    assert(onePass === union)
  }

  test("driftReport keeps the null-never-matches bucket convention of featureDrift") {
    val withNull = Seq((1L, "x"), (2L, null.asInstanceOf[String])).toDF("id", "k")
    val out = Drift.driftReport(a, withNull, Seq("k" -> col("k")))
      .as[(String, Long, Double, Double, Double)].head()
    assert(out._2 === 3L && out._3 === 0.5)
  }

  test("driftReport groups -0.0 with 0.0 like native grouping (string-cast repair)") {
    // v * 0.0 yields -0.0 for negative v, +0.0 for positive — the native
    // groupBy treats them as ONE bucket; the string-cast path must too.
    val p = Seq((1L, -2.0), (2L, 3.0)).toDF("id", "v")
    val q = Seq((3L, 4.0), (4L, -5.0)).toDF("id", "v")
    val feats = Seq("zero" -> (col("v") * 0.0))
    val onePass = Drift.driftReport(p, q, feats)
      .as[(String, Long, Double, Double, Double)].head()
    val native = Drift.featureDrift(p, q, col("v") * 0.0)
      .as[(Long, Double, Double, Double)].head()
    assert((onePass._2, onePass._3, onePass._4, onePass._5) === native)
    assert(onePass._2 === 1L) // one bucket, not a -0.0/0.0 split
  }
}
