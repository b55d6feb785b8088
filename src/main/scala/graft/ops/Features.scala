package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time-correct training-example assembly from an event log —
  * the feature-store discipline (public knowledge: every feature platform
  * documents it): for each ANCHOR event, features may only aggregate
  * strictly-earlier outcome events inside a trailing window, and the
  * label may only look at strictly-later outcomes inside a forward
  * horizon. Getting either boundary wrong leaks the future into training
  * ([[graft.ops.Joins]]' as-of join is the point-lookup half; this is the
  * windowed-aggregate half).
  *
  * Mechanics: one unified pass — anchors and outcomes stay ONE stream,
  * and both the trailing-feature frame and the forward-label frame are
  * RANGE window frames over the same (user, event-time-ms) sort, so the
  * whole assembly costs ONE exchange on the entity key and one ordered
  * window pass per entity. Same-millisecond outcomes are excluded from
  * BOTH frames (`[-w, -1]` and `[+1, +h]` in ms): an outcome simultaneous
  * with the anchor is neither safely "past" nor a caused "future".
  *
  * 100 TB shape: the exchange is entity-keyed (the natural key of a
  * feature store); a pathological mega-entity serializes its own window —
  * the standard mitigation is the salted twin of [[Joins]]' skew
  * machinery or capping entity history at the feature window. Aggregate
  * VALUE columns should be integer-shaped by the caller (e.g.
  * `floor(value·100)` cents) so frame-order float accumulation can never
  * smear the last ulp — the repo's usual exactness discipline.
  */
object Features {

  /** Assemble `(carry…, n_outcomes_past, value_past, converted)` rows,
    * one per anchor event.
    *
    * @param anchorCond   rows that become training examples
    * @param outcomeCond  rows whose presence/value is aggregated
    * @param valueCol     integer-shaped outcome value to sum over the
    *                     trailing window (evaluated on outcome rows only)
    * @param featureWindowMs trailing feature window `[t-w, t)` in ms
    * @param labelWindowMs   forward label horizon `(t, t+h]` in ms
    * @param carry        anchor columns to keep (ids, entity, …)
    */
  def rollingExamples(
      events: DataFrame,
      entityCol: String,
      tsCol: String,
      anchorCond: Column,
      outcomeCond: Column,
      valueCol: Column,
      featureWindowMs: Long,
      labelWindowMs: Long,
      carry: Seq[String]): DataFrame = {
    require(featureWindowMs > 0, s"featureWindowMs must be positive, got $featureWindowMs")
    require(labelWindowMs > 0, s"labelWindowMs must be positive, got $labelWindowMs")
    val entity = col(s"`$entityCol`")
    // epoch ms exactly as the oracle's epoch_ms(): micros floor-div 1000
    // (the repo's proven cross-engine convention — see join_range)
    val base = events.select(
      (entity +: expr(s"unix_micros(`$tsCol`) div 1000L").as("_t") +:
        anchorCond.as("_a") +: outcomeCond.as("_o") +:
        valueCol.cast("long").as("_v") +: carry.map(c => col(s"`$c`"))): _*)
    val order = Window.partitionBy(entity).orderBy(col("_t"))
    val past = order.rangeBetween(-featureWindowMs, -1)
    val future = order.rangeBetween(1, labelWindowMs)
    base
      .withColumn("n_outcomes_past",
        coalesce(sum(when(col("_o"), 1L).otherwise(0L)).over(past), lit(0L)))
      .withColumn("value_past",
        coalesce(sum(when(col("_o"), col("_v"))).over(past), lit(0L)))
      .withColumn("converted",
        coalesce(sum(when(col("_o"), 1L).otherwise(0L)).over(future), lit(0L)) > 0)
      .where(col("_a"))
      .select((carry.map(c => col(s"`$c`")) :+ entity :+
        col("n_outcomes_past") :+ col("value_past") :+ col("converted")): _*)
  }
}
