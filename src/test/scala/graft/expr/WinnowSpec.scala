package graft.expr

import graft.SparkSpecBase
import graft.ops.Dedup
import org.apache.spark.sql.functions._

/** Winnowing fingerprints + containment pairs: the portable-hash identity,
  * the winnowing guarantee, and the embedded-quote case whole-document
  * Jaccard structurally misses.
  */
class WinnowSpec extends SparkSpecBase {
  import spark.implicits._

  test("portableHash equals the SQL md5 construction") {
    val strings = Seq("a b c", "hello world", "x", "the quick brown")
    val viaSql = strings.toDF("s")
      .select(conv(substring(md5(col("s")), 1, 13), 16, 10).cast("long"))
      .as[Long].collect().toSeq
    assert(strings.map(WinnowAlgo.portableHash) == viaSql)
  }

  private def fps(text: String, k: Int = 3, w: Int = 4): Seq[Long] =
    Seq(text).toDF("t")
      .select(Winnow.fingerprints(col("t"), k, w)).as[Seq[Long]].head()

  test("fingerprints are sorted, distinct, and window-min selected") {
    val f = fps("one two three four five six seven eight nine ten")
    assert(f == f.sorted && f == f.distinct)
    // 8 grams, 5 windows → between 1 and 5 distinct minima
    assert(f.nonEmpty && f.size <= 5)
    // fewer than k tokens → empty; exactly k tokens → the single gram hash
    assert(fps("one two").isEmpty)
    assert(fps("one two three") == Seq(WinnowAlgo.portableHash("one two three")))
  }

  test("winnowing guarantee: a shared run of k+w-1 tokens shares a fingerprint") {
    // k=3, w=4: any common run of 6 tokens must plant a common fingerprint.
    val shared = "alpha beta gamma delta epsilon zeta"
    val a = fps(s"unrelated prefix words here $shared")
    val b = fps(s"$shared completely different suffix material")
    assert(a.toSet.intersect(b.toSet).nonEmpty)
  }

  test("containment flags an embedded quote that Jaccard misses") {
    val quote = "to be or not to be that is the question"
    val docs = Seq(
      (1L, quote),
      (2L, s"he began his long speech by citing $quote and then wandered " +
        "through many other topics entirely unrelated to the prince of " +
        "denmark for quite a long while before concluding with nothing"),
      (3L, "totally different text about spark query engines and shuffles")
    ).toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(docs, "doc_id", "text", tau = 0.5)
      .as[(Long, Long, Double)].collect().toSeq
    assert(cont.map(p => (p._1, p._2)) == Seq((1L, 2L)))
    assert(cont.head._3 >= 0.8) // nearly all of doc 1's fingerprints re-occur
    // whole-doc Jaccard at the same threshold sees nothing
    val jac = Dedup.ngramJaccardPairs(docs, "doc_id", "text", threshold = 0.5, shingleK = 3)
    assert(jac.count() == 0)
  }

  test("tau filters weak overlaps") {
    val docs = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "a b c d e f g h i j"), // identical → containment 1.0
      (3L, "z y x w v u t s r q")
    ).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, "doc_id", "text", tau = 0.99)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got.map(p => (p._1, p._2)) == Seq((1L, 2L)) && got.head._3 == 1.0)
  }
}
