package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Salted equi-join: result parity with the plain join, salt spread, and
  * determinism — the manual skew tool for the hot-key-floods-one-task case
  * AQE's partition splitting can't fix.
  */
class JoinsSpec extends SparkSpecBase {
  import spark.implicits._

  // One hot key (k=1, 100 rows) + a long tail; dimension side 1 row per key.
  private def fact = (1 to 100).map(i => (1L, i.toLong)) ++
    (2L to 20L).map(k => (k, k * 1000))
  private def factDf = fact.toDF("k", "row_id")
  private def dimDf = (1L to 20L).map(k => (k, s"name_$k")).toDF("k", "name")

  test("saltedEquiJoin returns exactly the plain join's rows") {
    val plain = factDf.join(dimDf, Seq("k"))
      .select("k", "row_id", "name").as[(Long, Long, String)].collect().sorted.toSeq
    val salted = Joins.saltedEquiJoin(factDf, dimDf, Seq("k"), "row_id", numSalts = 8)
      .select("k", "row_id", "name").as[(Long, Long, String)].collect().sorted.toSeq
    assert(salted === plain)
  }

  test("saltedEquiJoin matches plain join with a many-rows-per-key right side") {
    val dimMulti = (1L to 5L).flatMap(k => Seq((k, "a"), (k, "b"))).toDF("k", "tag")
    val plain = factDf.join(dimMulti, Seq("k"))
      .select("k", "row_id", "tag").as[(Long, Long, String)].collect().sorted.toSeq
    val salted = Joins.saltedEquiJoin(factDf, dimMulti, Seq("k"), "row_id", numSalts = 4)
      .select("k", "row_id", "tag").as[(Long, Long, String)].collect().sorted.toSeq
    assert(salted === plain)
  }

  test("the hot key's rows spread across many salt values") {
    val salts = factDf.where(col("k") === 1L)
      .withColumn("_salt", pmod(xxhash64(col("row_id")), lit(8L)))
      .select("_salt").distinct().count()
    assert(salts >= 6, s"hot key landed on only $salts of 8 salts")
  }

  test("keyskewProfile surfaces the hot key first with its share") {
    val top = Joins.keyskewProfile(factDf, Seq("k"), n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(top.head === (1L, 100L))
    val share = Joins.keyskewProfile(factDf, Seq("k"), n = 1)
      .select("share").as[Double].head()
    assert(math.abs(share - 100.0 / fact.size) < 1e-12)
  }
}
