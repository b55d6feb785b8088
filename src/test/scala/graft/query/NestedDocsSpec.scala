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
