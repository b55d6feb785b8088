package graft.query

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** ES join-field queries and aggs over a parent/child table pair —
  * semantics (matching-children bounds, semi-join de-duplication, the
  * parent-vs-child doc_count split) plus the no-aggregate plan shape at
  * has_child's default bounds.
  */
class JoinFieldSpec extends SparkSpecBase {
  import spark.implicits._

  // orders (parent) / items (child): p1 has 3 children (2 hot),
  // p2 has 1 hot child, p3 has 2 cold children, p4 is childless,
  // and one orphan child points at a missing parent
  private lazy val parents = Seq(
    (1L, "urgent"), (2L, "low"), (3L, "urgent"), (4L, "low"),
  ).toDF("pk", "prio")
  private lazy val children = Seq(
    (1L, 10L, "hot"), (1L, 11L, "hot"), (1L, 12L, "cold"),
    (2L, 20L, "hot"),
    (3L, 30L, "cold"), (3L, 31L, "cold"),
    (99L, 90L, "hot"), // orphan
  ).toDF("fk", "ck", "temp")

  test("has_child: matching-children bounds; semi-join emits each parent once") {
    def pks(min: Int = 1, max: Int = Int.MaxValue): Seq[Long] =
      JoinField.hasChild(parents, children, "pk", "fk",
          col("temp") === "hot", min, max)
        .select("pk").as[Long].collect().sorted.toSeq
    assert(pks() === Seq(1L, 2L))            // p1 twice-hot, p2 once-hot
    assert(pks(min = 2) === Seq(1L))         // min_children=2 drops p2
    assert(pks(min = 1, max = 1) === Seq(2L)) // max_children=1 drops p1
    // bounds count MATCHING children: p3 has 2 children but 0 hot
    assert(pks(min = 1, max = 10) === Seq(1L, 2L))
    // default bounds compile to a pure semi-join — no aggregate node
    val plan = JoinField.hasChild(parents, children, "pk", "fk",
      col("temp") === "hot").queryExecution.optimizedPlan.toString
    assert(plan.contains("LeftSemi") && !plan.contains("Aggregate"),
      s"default-bounds has_child should be agg-free:\n$plan")
    intercept[IllegalArgumentException](
      JoinField.hasChild(parents, children, "pk", "fk", lit(true), minChildren = 0))
    intercept[IllegalArgumentException](
      JoinField.hasChild(parents, children, "pk", "fk", lit(true),
        minChildren = 3, maxChildren = 2))
  }

  test("has_child score modes fold matching-children scores per parent") {
    val scored = Seq((1L, 10L, 2.0), (1L, 11L, 4.0), (2L, 20L, 6.0),
      (99L, 90L, 8.0)).toDF("fk", "ck", "sc")
    def run(mode: String): Map[Long, Double] =
      JoinField.hasChildScored(parents, scored, "pk", "fk",
          col("sc") > 0, col("sc"), mode)
        .select("pk", "_score").as[(Long, Double)].collect().toMap
    assert(run("sum") === Map(1L -> 6.0, 2L -> 6.0))
    assert(run("max") === Map(1L -> 4.0, 2L -> 6.0))
    assert(run("min") === Map(1L -> 2.0, 2L -> 6.0))
    assert(run("avg") === Map(1L -> 3.0, 2L -> 6.0))
    intercept[IllegalArgumentException](
      JoinField.hasChildScored(parents, scored, "pk", "fk",
        col("sc") > 0, col("sc"), "mean"))
  }

  test("has_parent / parent_id: children of matching / named parents") {
    val hp = JoinField.hasParent(parents, children, "pk", "fk",
      col("prio") === "urgent")
    assert(hp.select("ck").as[Long].collect().sorted.toSeq
      === Seq(10L, 11L, 12L, 30L, 31L)) // p1 + p3 children; orphan excluded
    val pid = JoinField.parentId(children, "fk", lit(2L))
    assert(pid.select("ck").as[Long].collect().toSeq === Seq(20L))
  }

  test("children / parent aggs: bucket-to-metric in both directions") {
    // children agg: parent prio buckets -> child counts + a child metric
    val ca = JoinField.childrenAgg(parents, children, "pk", "fk", "prio",
        Seq(sum(when(col("temp") === "hot", 1).otherwise(0)).as("hot_n")))
      .orderBy("key").as[(String, Long, Long)].collect().toSeq
    assert(ca === Seq(("low", 1L, 1L), ("urgent", 5L, 2L)))
    // parent agg: child temp buckets -> child doc_count + DISTINCT parents
    val pa = JoinField.parentAgg(parents, children, "pk", "fk", "temp")
      .orderBy("key").as[(String, Long, Long)].collect().toSeq
    // hot: 4 child rows but the orphan drops at the semi-join -> 3 child
    // docs across 2 distinct parents; cold: 3 children, 2 parents
    assert(pa === Seq(("cold", 3L, 2L), ("hot", 3L, 2L)))
  }
}
