package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Deterministic sampling: stability under repartitioning, fraction
  * calibration, split totality, stratum isolation.
  */
class SamplingSpec extends SparkSpecBase {
  import spark.implicits._

  private def docs = (1L to 2000L).map(i => (i, s"src${i % 4}")).toDF("id", "src")

  test("hashSample is deterministic and partition-invariant") {
    val a = Sampling.hashSample(docs, "id", 0.2).select("id").as[Long].collect().sorted.toSeq
    val b = Sampling.hashSample(docs.repartition(13), "id", 0.2)
      .select("id").as[Long].collect().sorted.toSeq
    assert(a === b)
    // calibration: fraction of 2000 rows within a loose binomial band
    assert(a.length > 300 && a.length < 500, s"got ${a.length}")
  }

  test("a larger fraction strictly contains a smaller one (nested samples)") {
    val small = Sampling.hashSample(docs, "id", 0.1).select("id").as[Long].collect().toSet
    val large = Sampling.hashSample(docs, "id", 0.3).select("id").as[Long].collect().toSet
    assert(small.subsetOf(large))
  }

  test("assignSplit labels every row exactly once with calibrated shares") {
    val out = Sampling.assignSplit(docs, "id", Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125))
    assert(out.count() === 2000)
    val byKey = out.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(byKey.keySet === Set("train", "val", "test"))
    assert(byKey("train") > 1400 && byKey("train") < 1600, byKey.toString)
    // re-running yields identical assignment
    val again = Sampling.assignSplit(docs, "id", Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125))
    assert(out.orderBy("id").select("split").as[String].collect().toSeq
      === again.orderBy("id").select("split").as[String].collect().toSeq)
  }

  test("stratified sampling keeps only listed strata at their fractions") {
    val out = Sampling.stratifiedHashSample(docs, "id", "src",
      Map("src0" -> 1.0, "src1" -> 0.5))
    val byStratum = out.groupBy("src").count().as[(String, Long)].collect().toMap
    assert(byStratum("src0") === 500)                      // fraction 1.0 keeps all
    assert(byStratum("src1") > 180 && byStratum("src1") < 320)
    assert(!byStratum.contains("src2") && !byStratum.contains("src3"))
  }

  test("different seeds draw different samples") {
    val a = Sampling.hashSample(docs, "id", 0.2, seed = 1).select("id").as[Long].collect().toSet
    val b = Sampling.hashSample(docs, "id", 0.2, seed = 2).select("id").as[Long].collect().toSet
    assert(a !== b)
  }
}
