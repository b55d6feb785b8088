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

  /** The skew diagnostic that decides whether salting is worth it: top-`n`
    * heaviest join-key groups with their share of the table. A key holding
    * more rows than `rows / shuffle-partitions` is a task-flooding
    * candidate.
    */
  def keyskewProfile(df: DataFrame, keys: Seq[String], n: Int = 20): DataFrame = {
    // One scan, not two: the total derives from the per-key counts with an
    // unpartitioned window over the AGGREGATED frame (|distinct keys| rows
    // of key + count — a fraction of the input this diagnostic targets),
    // instead of a separate df.count() job re-reading the full table.
    val counts = df.groupBy(keys.map(c => col(s"`$c`")): _*)
      .agg(count(lit(1)).as("rows"))
    val total = sum(col("rows")).over(Window.partitionBy())
    counts
      .withColumn("share", col("rows") / total.cast("double"))
      .orderBy(desc("rows"), asc(keys.head))
      .limit(n)
  }
}
