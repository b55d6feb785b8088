package graft.query

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** ES rank_eval: hand-computed metric values, the DCG fold contract, and
  * the degenerate edges (no relevant docs; empty judged set).
  */
class RankEvalSpec extends SparkSpecBase {
  import spark.implicits._

  private def log2inv(pos: Int): Double = 1.0 / (math.log(pos + 1) / math.log(2.0))

  test("precision, recall, MRR, and NDCG match hand values") {
    // run: ids 1..5 at scores 5..1 -> ranks 1..5; judged set {1,3,10,11}
    val run = (1 to 5).map(i => (i.toLong, (6 - i).toDouble)).toDF("id", "score")
    val rel = Seq(1L, 3L, 10L, 11L).toDF("id")
    val out = RankEval.evaluate(run, "id", "score", rel, k = 5)
      .as[(Double, Double, Double, Double)].head()
    assert(out._1 === 2.0 / 5) // 2 of 5 hits relevant
    assert(out._2 === 2.0 / 4) // 2 of 4 judged found
    assert(out._3 === 1.0)     // first relevant at rank 1
    // DCG fold in rank order (zeros interleaved), ideal over min(k, R)=4
    val dcg = Seq(log2inv(1), 0.0, log2inv(3), 0.0, 0.0).foldLeft(0.0)(_ + _)
    val idcg = (1 to 4).map(log2inv).foldLeft(0.0)(_ + _)
    assert(out._4 === math.round(dcg / idcg * 1e6) / 1e6)
  }

  test("no relevant hit in the run: MRR and NDCG are 0, recall counts the judged set") {
    val run = (1 to 3).map(i => (i.toLong, (4 - i).toDouble)).toDF("id", "score")
    val out = RankEval.evaluate(run, "id", "score", Seq(9L).toDF("id"), k = 3)
      .as[(Double, Double, Double, Double)].head()
    assert(out === ((0.0, 0.0, 0.0, 0.0)))
  }

  test("empty judged set: everything 0, no division blow-ups") {
    val run = Seq((1L, 1.0)).toDF("id", "score")
    val out = RankEval.evaluate(run, "id", "score",
      spark.emptyDataset[Long].toDF("id"), k = 5)
      .as[(Double, Double, Double, Double)].head()
    assert(out === ((0.0, 0.0, 0.0, 0.0)))
  }
}
