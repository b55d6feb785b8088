package graft.query

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** ES nested-vs-object mapping semantics: the same-element requirement
  * and the flattened cross-element false positive, on a hand corpus.
  */
class NestedDocsSpec extends SparkSpecBase {
  import spark.implicits._

  // parent 1: one item satisfies BOTH conditions → nested + object
  // parent 2: conditions satisfied by DIFFERENT items → object only
  // parent 3: only one condition satisfiable at all → neither
  private lazy val children = Seq(
    (1L, 50.0, 0.10),
    (1L, 10.0, 0.00),
    (2L, 50.0, 0.00),
    (2L, 10.0, 0.10),
    (3L, 50.0, 0.00),
  ).toDF("pk", "qty", "disc")

  test("nest + nestedMatch require the SAME element; objectMatch cross-matches") {
    val items = NestedDocs.nest(children, "pk", Seq("qty", "disc"))
    val out = items.select(col("pk"),
        NestedDocs.nestedMatch(col("items"),
          it => it("qty") >= 45 && it("disc") >= 0.08).as("n"),
        NestedDocs.objectMatch(col("items"), Seq(
          it => it("qty") >= 45, it => it("disc") >= 0.08)).as("o"))
      .as[(Long, Boolean, Boolean)].collect().sortBy(_._1).toSeq
    assert(out === Seq((1L, true, true), (2L, false, true), (3L, false, false)))
  }

  test("nest is one bounded hash aggregate keyed on the parent") {
    val items = NestedDocs.nest(children, "pk", Seq("qty"))
    assert(items.count() === 3)
    assert(items.schema("items").dataType.typeName === "array")
    // plan shape: aggregate over the child scan, no join
    val plan = items.queryExecution.executedPlan.toString
    assert(plan.contains("collect_list") && !plan.contains("Join"))
    intercept[IllegalArgumentException](NestedDocs.nest(children, "pk", Nil))
    intercept[IllegalArgumentException](NestedDocs.objectMatch(col("items"), Nil))
  }

  test("nestedAgg: child doc_count + reverse_nested distinct-parent count per bucket") {
    val items = NestedDocs.nest(children, "pk", Seq("qty", "disc"))
    val got = NestedDocs.nestedAgg(items, "pk", "items",
        it => it("disc") >= 0.08, as = "hi_disc")
      .as[(Boolean, Long, Long)].collect().sortBy(_._1).toSeq
    // hi_disc=true: children (1,.10) and (2,.10) → 2 child docs across 2
    // parents; false: 3 child docs across parents {1,2,3}
    assert(got === Seq((false, 3L, 3L), (true, 2L, 2L)))
    // parent_count ≠ doc_count is the whole reverse_nested point: parent 1
    // holds TWO low-disc children? no — each parent here holds one per
    // bucket, so sharpen: a parent with two same-bucket children counts
    // once as a parent, twice as docs
    val skew = Seq((9L, 1.0), (9L, 2.0)).toDF("pk", "qty")
    val agg2 = NestedDocs.nestedAgg(
        NestedDocs.nest(skew, "pk", Seq("qty")), "pk", "items",
        it => it("qty") > 0, as = "pos")
      .as[(Boolean, Long, Long)].collect().toSeq
    assert(agg2 === Seq((true, 2L, 1L)))
  }

  test("nest: maxChildren raises in-plan on a skewed parent, naming it") {
    // parent 1 has 2 children, parent 2 has 2, parent 3 has 1:
    // maxChildren=1 must intercept at materialization and NAME a skewed key
    val e = intercept[Exception] {
      NestedDocs.nest(children, "pk", Seq("qty"), maxChildren = 1).count()
    }
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("NestedDocs.nest") && msg.contains("maxChildren=1"))
    // at the bound (2) every parent passes — the guard is > not >=
    assert(NestedDocs.nest(children, "pk", Seq("qty"), maxChildren = 2)
      .count() === 3)
    intercept[IllegalArgumentException](
      NestedDocs.nest(children, "pk", Seq("qty"), maxChildren = 0))
  }
}
