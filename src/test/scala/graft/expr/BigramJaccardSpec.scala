package graft.expr

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** The r18 RERANK ngram-jaccard kernel certified against the HOF
  * formulation it replaced (the kernel's scaladoc pins the semantics;
  * this spec pins them EXECUTABLY): for every row of an adversarial
  * fixture — nulls, empties, pure whitespace, runs of spaces, sub-2-token
  * texts, within-doc repeated shingles, texts equal to / disjoint from /
  * partially overlapping the query, multi-byte characters — the kernel's
  * score must equal the original
  * `array_intersect / array_distinct∘concat` tree bit for bit (both are
  * exact small-int ratios, so equality is exact, not approximate).
  */
class BigramJaccardSpec extends SparkSpecBase {
  import spark.implicits._

  /** The ORIGINAL HOF formulation (pre-r18 Esql RERANK body), verbatim. */
  private def hofJaccard(field: org.apache.spark.sql.Column,
      qSh: Seq[String]): org.apache.spark.sql.Column = {
    val toks = filter(split(trim(field), " +"), t => length(t) > 0)
    val sh = when(size(toks) >= 2,
      array_distinct(transform(sequence(lit(1), size(toks) - 1),
        i => concat(element_at(toks, i), lit(" "), element_at(toks, i + 1)))))
      .otherwise(array().cast("array<string>"))
    val qArr = array(qSh.map(lit): _*)
    val inter = size(array_intersect(sh, qArr))
    val uni = size(array_distinct(concat(sh, qArr)))
    inter.cast("double") / uni.cast("double")
  }

  private val rows = Seq(
    (1L, "dup vector scan merge"),            // exact query text
    (2L, "merge scan vector dup"),            // same tokens, reversed order
    (3L, "dup vector dup vector dup vector"), // repeated shingles collapse
    (4L, "completely unrelated words here"),  // disjoint
    (5L, "vector scan alone"),                // partial overlap
    (6L, "dup"),                              // single token → empty set
    (7L, ""),                                 // empty text
    (8L, "   "),                              // whitespace only
    (9L, null.asInstanceOf[String]),          // null text
    (10L, "  dup   vector  scan   "),         // runs of spaces + padding
    (11L, "día über dup vector naïve"),       // multi-byte chars
    (12L, "a b a b a b c"),                   // self-overlapping bigrams
    (13L, "dup vector scan merge dup vector") // query shingles repeated
  )

  test("kernel score equals the HOF tree on every adversarial row") {
    val qSh = Seq("dup vector", "vector scan", "scan merge")
    val df = rows.toDF("id", "text")
      // the HOF form consumed the analyzer's normalized column; the fixture
      // is already lowercase-token-shaped, so identity stands in — the
      // kernel sees the SAME column either way
      .withColumn("hof", hofJaccard(col("text"), qSh))
      .withColumn("kernel", BigramJaccard(coalesce(col("text"), lit("")), qSh))
    val out = df.select("id", "hof", "kernel")
      .as[(Long, Double, Double)].collect().sortBy(_._1)
    out.foreach { case (id, hof, kernel) =>
      assert(kernel === hof, s"row $id: kernel $kernel != hof $hof")
    }
    // teeth: the fixture spans the interesting range, not just zeros
    val byId = out.map(r => r._1 -> r._3).toMap
    assert(byId(1L) === 1.0)   // identical shingle sets
    assert(byId(4L) === 0.0)   // disjoint
    assert(byId(9L) === 0.0)   // null → 0.0, not null
    assert(byId(5L) > 0.0 && byId(5L) < 1.0)
  }

  test("duplicate query shingles are collapsed by the constructor") {
    val df = Seq((1L, "dup vector scan")).toDF("id", "text")
      .withColumn("j", BigramJaccard(col("text"),
        Seq("dup vector", "dup vector", "vector scan")))
    // doc set = {dup vector, vector scan}; q set distinct = same 2
    assert(df.select("j").as[Double].head() === 1.0)
  }
}
