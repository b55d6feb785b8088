package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Integer-quantized odds-ratio classifier: hand-computed weights and
  * scores, label-flip antisymmetry, vocabulary pruning, zero-vocab docs.
  */
class QualityModelSpec extends SparkSpecBase {
  import spark.implicits._

  // pos = {1, 2} under the test label; d5's only token is too rare for the
  // minDf=2 vocabulary, so d5 must score 0, not vanish.
  private def docs = Seq(
    (1L, "alpha beta"),
    (2L, "alpha gamma"),
    (3L, "delta beta"),
    (4L, "delta delta gamma"),
    (5L, "zzz zzz")).toDF("doc_id", "text")

  private val label = col("doc_id") <= 2

  test("trainTokenWeights: hand-computed integer odds-ratio weights") {
    val w = QualityModel.trainTokenWeights(docs, "doc_id", "text", label, minDf = 2)
      .as[(String, Long)].collect().toMap
    // alpha: pos_df=2 neg_df=0 -> 1000*3 div 1 - 1000*1 div 3 = 3000-333
    assert(w("alpha") === 2667L)
    // beta/gamma: df 1/1 -> symmetric, weight 0
    assert(w("beta") === 0L)
    assert(w("gamma") === 0L)
    // delta: mirror of alpha
    assert(w("delta") === -2667L)
    // zzz: df 1 < minDf, pruned
    assert(!w.contains("zzz"))
  }

  test("scoreDocs: BIGINT tf-weighted sums; vocab-free docs score 0") {
    val scored = QualityModel.distill(docs, "doc_id", "text", label, minDf = 2)
      .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(scored === Seq(
      (1L, 2667L, true),   // alpha*1
      (2L, 2667L, true),
      (3L, -2667L, false), // delta*1
      (4L, -5334L, false), // delta tf=2
      (5L, 0L, false)))    // no weighted token
  }

  test("label flip negates every weight (floor-div antisymmetry in the swap)") {
    val w = QualityModel.trainTokenWeights(docs, "doc_id", "text", label, minDf = 2)
      .as[(String, Long)].collect().toMap
    val flipped = QualityModel.trainTokenWeights(docs, "doc_id", "text", !label, minDf = 2)
      .as[(String, Long)].collect().toMap
    assert(flipped === w.map { case (t, v) => (t, -v) })
  }

  test("lengthLabel is the exact token-count floor") {
    val lab = docs.select(col("doc_id"),
      QualityModel.lengthLabel(col("text"), minTokens = 2).as("l"))
      .as[(Long, Boolean)].collect().toMap
    assert(lab === Map(1L -> true, 2L -> true, 3L -> true, 4L -> true, 5L -> true))
    val strict = docs.select(col("doc_id"),
      QualityModel.lengthLabel(col("text"), minTokens = 3).as("l"))
      .as[(Long, Boolean)].collect().toMap
    assert(strict === Map(1L -> false, 2L -> false, 3L -> false, 4L -> true, 5L -> false))
  }

  test("scoring joins the weight table broadcast — no corpus-sized shuffle on the join") {
    val plan = QualityModel.distill(docs, "doc_id", "text", label, minDf = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join in:\n$plan")
  }

  test("classifierReport: hand-computed cells and metrics, null-safe degenerate cases") {
    import spark.implicits._
    // tp=2 fp=1 tn=3 fn=1 -> acc 5/7, prec 2/3, rec 2/3, f1 2/3,
    // kappa = (5/7 - 25/49)/(1 - 25/49) = 10/24
    val rows = Seq(
      (true, true), (true, true), (true, false),
      (false, false), (false, false), (false, false), (false, true),
    ).toDF("predicted", "actual")
    val r = QualityModel.classifierReport(rows, "predicted", "actual").collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) === ((2L, 1L, 3L, 1L)))
    assert(r.getDouble(4) === 5.0 / 7)
    assert(r.getDouble(5) === 2.0 / 3)
    assert(r.getDouble(6) === 2.0 / 3)
    assert(r.getDouble(7) === 2.0 * (2.0 / 3) * (2.0 / 3) / ((2.0 / 3) + (2.0 / 3)))
    val po = 5.0 / 7; val pe = (3.0 * 3 + 4.0 * 4) / 49
    assert(r.getDouble(8) === (po - pe) / (1.0 - pe))
    // never-predicts-positive: precision and f1 null, recall 0
    val neg = Seq((false, true), (false, false)).toDF("predicted", "actual")
    val rn = QualityModel.classifierReport(neg, "predicted", "actual").collect()(0)
    assert(rn.isNullAt(5) && rn.isNullAt(7))
    assert(rn.getDouble(6) === 0.0)
  }

  test("auc: rank-sum hand values, average-rank ties, degenerate classes") {
    import spark.implicits._
    def aucOf(rows: Seq[(Long, Boolean)]): (Long, Long, Option[Double]) = {
      val r = QualityModel.auc(rows.toDF("score", "actual"), "score", "actual")
        .collect()(0)
      (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))
    }
    // perfectly separable incl. a tie WITHIN the positive class
    assert(aucOf(Seq((3L, true), (3L, true), (2L, true), (1L, false), (0L, false)))
      === ((3L, 2L, Some(1.0))))
    // a cross-class tie gets the average rank: single tied pair -> 0.5
    assert(aucOf(Seq((2L, true), (2L, false))) === ((1L, 1L, Some(0.5))))
    // perfectly inverted
    assert(aucOf(Seq((1L, true), (2L, false))) === ((1L, 1L, Some(0.0))))
    // a missing class yields null, not a division blow-up
    assert(aucOf(Seq((1L, true), (2L, true))) === ((2L, 0L, None)))
    // the distinct-score guard refuses loudly
    val wide = (1L to 50L).map(s => (s, s % 2 == 0)).toDF("score", "actual")
    val e = intercept[Exception](
      QualityModel.auc(wide, "score", "actual", maxDistinctScores = 10).collect())
    assert(e.getMessage.contains("distinct scores"))
  }
}
