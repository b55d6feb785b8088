package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join strategies for the shapes Spark's defaults mishandle at scale.
  *
  * The engine's first-line answers to join skew are (in order): broadcast
  * the small side (`broadcast()` — no shuffle at all), and AQE's runtime
  * skew-join splitting (`spark.sql.adaptive.skewJoin`, on by default —
  * splits oversized partitions AFTER the shuffle files exist). Manual
  * salting remains the tool for the case both miss: a sort-merge/hash join
  * where one side has a hot key (a null-ish sentinel, an empty-text
  * fingerprint, a mega-customer) hot enough that even a split partition's
  * single key floods one task, or where AQE is unavailable (streaming
  * joins, non-adaptive deployments).
  */
object Joins {

  /** Equi-join with the left side's hot keys spread over `numSalts`
    * reducers: every left row gets a deterministic salt from its `saltBy`
    * column, the right side is replicated once per salt value, and the join
    * key becomes `(key, salt)` — a hot key's rows land on `numSalts` tasks
    * instead of one. Exact same rows as `left.join(right, keys)` for any
    * 1-row-per-key right side, and for many-per-key right sides too (the
    * replication is per salt VALUE, each left row joins exactly one
    * replica).
    *
    * Cost model, stated plainly: the right side is shuffled `numSalts`
    * times over — this is the explicit price of spreading the left's skew,
    * so it is the dimension-sized side that belongs on the right. (If the
    * right side fits a broadcast, use `broadcast()` instead — salting a
    * broadcastable join is pure overhead.)
    *
    * @param saltBy a left column with per-row variation under the hot key —
    *               a row id, a line number; the salt is `xxhash64(saltBy) %
    *               numSalts`, deterministic per row (no RNG, stable under
    *               retries).
    */
  def saltedEquiJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      saltBy: String,
      numSalts: Int): DataFrame = {
    require(numSalts >= 1, "numSalts must be >= 1")
    require(!left.columns.contains("_salt") && !right.columns.contains("_salt"),
      "saltedEquiJoin: '_salt' column name is reserved")
    val salted = left.withColumn("_salt",
      pmod(xxhash64(col(s"`$saltBy`")), lit(numSalts.toLong)))
    val replicated = right.withColumn("_salt",
      explode(array((0 until numSalts).map(i => lit(i.toLong)): _*)))
    salted.join(replicated, keys :+ "_salt").drop("_salt")
  }

  /** Point-in-time ("as-of") join: for every left row, the LATEST right row
    * with the same key and `rightTime <= leftTime` (optionally within a
    * `tolerance` lookback window) — the enrichment join a training-data
    * pipeline needs for leakage-free feature attachment (each example sees
    * only state known at its own timestamp). The reference has no joins at
    * all (SURVEY §1.1 — datasets are "loosely coupled"); this is a
    * beyond-parity operator of the training-pipeline tier.
    *
    * Spark-first formulation: NOT a range join (`l.key = r.key AND r.ts <=
    * l.ts` explodes to every earlier right row per left row — quadratic per
    * hot key — before a per-left-row reduction), but the union-and-fill
    * construction: tag both sides, union them, and run ONE window per key
    * ordered by `(time, side, tiebreak)` where `last(payload,
    * ignoreNulls)` carries the most recent right payload forward onto each
    * left row. Cost at any scale: a single hash exchange on the key plus a
    * per-key sort — the same shape as any windowed aggregation, linear in
    * rows, no candidate blow-up. (Flink's temporal join and pandas
    * `merge_asof` are per-partition forms of the same sweep.)
    *
    * Semantics pinned by the `join_asof` oracle (restated in DuckDB as a
    * genuinely different algorithm — per-row `LATERAL ... ORDER BY ts DESC
    * LIMIT 1` lookup):
    *   - inclusive on equal timestamps (a right row AT `leftTime` matches:
    *     right sorts before left at the same instant);
    *   - among right rows sharing `(key, rightTime)`, the largest
    *     `rightTieBreak` wins (pass one whenever `(key, time)` is not
    *     unique, or the pick is tie-broken by engine partition order);
    *   - left rows with no qualifying right row keep NULL payloads (left
    *     outer);
    *   - with `tolerance = Some(interval)`, a match older than `leftTime -
    *     interval` is discarded (the fill still finds the overall latest —
    *     if THAT is out of window, every other right row is older still, so
    *     nulling it is exact, not approximate).
    *
    * @param rightPayload right columns to carry onto matches, emitted as
    *                     `asof_<name>`; the match's own timestamp travels as
    *                     `asof_<rightTime>`
    * @param tolerance    max lookback as an interval expression, e.g.
    *                     `expr("INTERVAL 7 DAYS")`
    */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightPayload: Seq[String],
      tolerance: Option[Column] = None,
      rightTieBreak: Option[String] = None): DataFrame =
    asOfImpl(left, right, keys, leftTime, rightTime, rightPayload,
      tolerance, rightTieBreak, forward = false)

  /** FORWARD as-of: each left row joins the EARLIEST right row at-or-after
    * its timestamp (pandas `merge_asof(direction='forward')`) — "the next
    * event after": next purchase after a click, next error after a deploy.
    * The same union-and-fill sweep traversed in descending time, so "last
    * right seen" is the smallest time ≥ current; inclusive-at-equal and
    * largest-tiebreak semantics carry over unchanged, and `tolerance`
    * bounds the LOOKAHEAD (`rightTime ≤ leftTime + tolerance`).
    */
  def asOfJoinForward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightPayload: Seq[String],
      tolerance: Option[Column] = None,
      rightTieBreak: Option[String] = None): DataFrame =
    asOfImpl(left, right, keys, leftTime, rightTime, rightPayload,
      tolerance, rightTieBreak, forward = true)

  private def asOfImpl(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightPayload: Seq[String],
      tolerance: Option[Column],
      rightTieBreak: Option[String],
      forward: Boolean): DataFrame = {
    val reserved = Seq("_t", "_side", "_tie", "_r", "_match")
    require(reserved.forall(c => !left.columns.contains(c)),
      s"asOfJoin: left column names ${reserved.mkString("/")} are reserved")
    require(keys.forall(right.columns.contains),
      "asOfJoin: every key must exist on the right side under the same name")
    val tie = rightTieBreak.map(c => col(s"`$c`")).getOrElse(lit(0L))
    // The right payload travels as one struct so a single last(_, ignoreNulls)
    // fills timestamp and payload atomically (per-column fills could mix
    // fields from different right rows when payload columns hold NULLs).
    val rSel = right.select(
      keys.map(c => col(s"`$c`")) ++ Seq(
        col(s"`$rightTime`").as("_t"),
        lit(0).as("_side"),
        tie.as("_tie"),
        struct(col(s"`$rightTime`").as("_rt") +:
          rightPayload.map(c => col(s"`$c`").as(c)): _*).as("_r")): _*)
    val lSel = left
      .withColumn("_t", col(s"`$leftTime`"))
      .withColumn("_side", lit(1))
      .withColumn("_tie", lit(0L).cast(rSel.schema("_tie").dataType))
      .withColumn("_r", lit(null).cast(rSel.schema("_r").dataType))
    // allowMissingColumns: right rows carry NULL for the left-only columns;
    // they are dropped after the fill, never surfaced.
    val unioned = lSel.unionByName(rSel, allowMissingColumns = true)
    // Backward sweeps time ascending ("latest right at-or-before");
    // forward sweeps descending ("earliest right at-or-after"). Right
    // still sorts before left at an equal instant (side asc), and among
    // equal (key, time) rights the fill's last-seen is the largest
    // tiebreak either way (tie asc within the group).
    val w = Window
      .partitionBy(keys.map(c => col(s"`$c`")): _*)
      .orderBy(if (forward) col("_t").desc else col("_t").asc,
        col("_side").asc, col("_tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = unioned.withColumn("_r", last(col("_r"), ignoreNulls = true).over(w))
    val inWindow = tolerance match {
      case Some(tol) if forward =>
        col("_r").isNotNull && col("_r").getField("_rt") <= col("_t") + tol
      case Some(tol) =>
        col("_r").isNotNull && col("_r").getField("_rt") >= col("_t") - tol
      case None => col("_r").isNotNull
    }
    val matched = filled
      .where(col("_side") === 1)
      .withColumn("_match", when(inWindow, col("_r")))
    val payloadCols =
      col("_match").getField("_rt").as(s"asof_$rightTime") +:
        rightPayload.map(c => col("_match").getField(c).as(s"asof_$c"))
    matched.select(left.columns.map(c => col(s"`$c`")) ++ payloadCols: _*)
  }

  /** The skew diagnostic that decides whether salting is worth it: top-`n`
    * heaviest join-key groups with their share of the table. A key holding
    * more rows than `rows / shuffle-partitions` is a task-flooding
    * candidate.
    */
  def keyskewProfile(df: DataFrame, keys: Seq[String], n: Int = 20): DataFrame = {
    // The diagnostic runs precisely where |distinct keys| is large (that is
    // what it checks), so NOTHING here may funnel the aggregated frame
    // through one task. Top-n is `orderBy.limit` (per-partition partial
    // top-n, then a final n-row merge — never a full sort or an
    // unpartitioned window over all keys), and the denominator is a scalar
    // aggregate attached via a 1-row broadcast. Still one data scan: both
    // branches consume the identical groupBy exchange, which Spark's
    // ReuseExchange rule materializes once (pinned in JoinsSpec).
    val counts = df.groupBy(keys.map(c => col(s"`$c`")): _*)
      .agg(count(lit(1)).as("rows"))
    val topn = counts.orderBy(desc("rows"), asc(keys.head)).limit(n)
    val total = counts.agg(sum(col("rows")).as("_total"))
    topn.crossJoin(broadcast(total))
      .withColumn("share", col("rows") / col("_total").cast("double"))
      .drop("_total")
      .orderBy(desc("rows"), asc(keys.head))
  }

  /** Interval-overlap (range) join: all `(left, right)` pairs sharing the
    * equi-keys whose CLOSED intervals `[leftStart, leftEnd]` and
    * `[rightStart, rightEnd]` overlap. Spark's planner turns a bare
    * non-equi overlap predicate into a nested-loop join — quadratic per
    * key. This is the standard BINNING rewrite instead: each interval
    * explodes to the `binWidth`-sized bins it covers, candidates hash-join
    * on `(keys…, bin)`, the overlap predicate filters exactly, and each
    * qualifying pair is emitted ONCE — in the first bin both intervals
    * share (`max` of the two start bins; the bin ranges of overlapping
    * intervals always intersect there) — so no distinct shuffle is needed.
    *
    * Cost: rows explode by `span/binWidth + 1`; pick `binWidth` near the
    * typical interval span so the factor stays ~2 and no bin becomes a hot
    * key (a bin is a hot key exactly when many intervals cross it). All
    * bound columns must be integral (epoch ms/ns, not timestamps — convert
    * first, and the oracle restates the same integer `div` arithmetic).
    * Output: left columns + right columns (names must not collide beyond
    * the equi-keys).
    */
  def rangeJoin(
      left: DataFrame,
      right: DataFrame,
      equiKeys: Seq[String],
      leftStart: String,
      leftEnd: String,
      rightStart: String,
      rightEnd: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"rangeJoin: binWidth must be positive, got $binWidth")
    def binned(df: DataFrame, start: String, end: String): DataFrame =
      df.withColumn("_bin", explode(sequence(
        expr(s"`$start` div ${binWidth}L"), expr(s"`$end` div ${binWidth}L"))))
    val joined = binned(left, leftStart, leftEnd)
      .join(binned(right, rightStart, rightEnd), equiKeys :+ "_bin")
    joined
      .where(col(s"`$leftStart`") <= col(s"`$rightEnd`") &&
        col(s"`$rightStart`") <= col(s"`$leftEnd`"))
      .where(col("_bin") === greatest(
        expr(s"`$leftStart` div ${binWidth}L"), expr(s"`$rightStart` div ${binWidth}L")))
      .drop("_bin")
  }
}
