package graft.dict

import graft.etl.Harmonizer
import graft.schema.{HarmonizedSchema, StdVar, VarType}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One data-dictionary row — one per *column* of a profiled table. Schema
  * restates the reference's fixed 13-column dictionary
  * (`harmonizeCrimeIncidents.py:356-381`; executed DDL
  * `notebooks/html/Detroit-notebook.html:13505`). Deliberately preserved
  * quirks (SURVEY.md §1.4): `dict_min`/`dict_max` are STRING (the
  * reference's UNION ALL coerces mixed types to string);
  * `dict_uifilter` is the *string* `'True'`/`'False'` (webapp
  * string-compares it, `views.js:582`).
  */
final case class DictEntry(
    dict_field: String,
    dict_count: Long,
    dict_countdistinct: Long,
    dict_countmissing: Long,
    dict_mean: Option[Double],
    dict_stddev: Option[Double],
    dict_min: Option[String],
    dict_max: Option[String],
    dict_vargroup: String,
    dict_vardescr: String,
    dict_uifilter: String,
    dict_varmapping: String,
    dict_vartype: String,
)

/** Data-dictionary profiler (reference `buildDataDict`,
  * `harmonizeCrimeIncidents.py:337-406`).
  *
  * The reference issues one aggregation query *per column* and UNION ALLs the
  * N single-row results — N full scans of the table (~27 for Baltimore).
  * Here each column contributes one narrow aggregate branch over a parquet
  * scan PRUNED to that column, UNION ALLed — total scan bytes across all
  * branches equal ONE full-width scan (parquet is columnar), and every
  * branch stays inside whole-stage codegen. The obvious alternative — a
  * single wide `agg` with 7×N aggregate expressions unpivoted by `stack` —
  * is 3-4× slower in practice: string-typed `min`/`max` buffers are not
  * fixed-width, so the whole 7×N-function aggregate plans as a row-at-a-time
  * SortAggregate with codegen disabled (measured 2.2 s vs 0.6 s on a
  * 16-column 600k-row table), and it reads all columns even though each
  * aggregate touches one. Set `exactDistinct = false` to swap
  * `COUNT(DISTINCT)` for HyperLogLog `approx_count_distinct` (the
  * reference's exact distinct per column is a full shuffle per column at
  * scale).
  */
object Dictionary {

  private def isNumeric(dt: DataType): Boolean = dt match {
    case _: NumericType => true
    case _ => false
  }

  /** Profile every column of `df` into a dictionary DataFrame.
    *
    * @param metadata       per-field harmonized metadata (defaults to the
    *                       standard vocabulary registry)
    * @param varMapping     per-field lineage notes (from [[Harmonizer]])
    * @param exactDistinct  exact `COUNT(DISTINCT)` vs HLL approximation
    */
  def profile(
      df: DataFrame,
      metadata: Map[String, StdVar] = HarmonizedSchema.byName,
      varMapping: Map[String, String] = Map.empty,
      transformDescr: Map[String, String] = Map.empty,
      defaultVarGroup: String = "dataset",
      exactDistinct: Boolean = true): DataFrame = {

    val fields = df.schema.fields
    require(fields.nonEmpty, "profile: empty schema")

    // 7 narrow aggregates per column, one branch per column (see object doc
    // for why NOT one wide agg: string min/max buffers force the wide plan
    // out of HashAggregate + codegen). A branch is scan → map-side partial
    // → one tiny final buffer — the only data-row shuffle is the exact
    // distinct's, and a branch carries exactly ONE distinct aggregate, the
    // case Catalyst plans as clean two-phase partial-dedup (group by the
    // value, then merge) with NO Expand. N distinct aggregates in one wide
    // agg would Expand (×N+1 row blow-up) whose hash state holds every
    // aggregate buffer per (gid, value) group — measured 35s+ on an
    // 11-column 600k-row table. The distinct shuffles the column's NATIVE
    // type (8-byte longs/doubles, not a string rendering).
    //
    // Variable-width (string/binary) columns split into TWO branches: their
    // min/max buffers are legal only in SortAggregate, and a SortAggregate
    // *grouped by the value* (the fused exact-distinct phase 1) sorts the
    // whole column — measured ~1 s alone on a 600k-unique string column.
    // Unfused, the stats branch is a no-grouping single-buffer fold (no
    // sort: nothing to order by) and the distinct branch is a plain
    // group-by-value HashAggregate (string KEYS are fine in HashAggregate —
    // only variable-width BUFFERS are not) — both shapes stay linear.
    val stats = fields.map { f =>
      val c = col("_c")
      val numeric = isNumeric(f.dataType)
      val fixedWidth = f.dataType match {
        case _: StringType | _: BinaryType => false
        case _ => true
      }
      val narrow = df.select(col(s"`${f.name}`").as("_c"))
      val statAggs = Seq(
        count(c).as("dict_count"),
        sum(when(c.isNull, 1).otherwise(0)).cast(LongType).as("dict_countmissing"),
        (if (numeric) avg(c).cast(DoubleType) else lit(null).cast(DoubleType)).as("dict_mean"),
        (if (numeric) stddev_pop(c).cast(DoubleType) else lit(null).cast(DoubleType)).as("dict_stddev"),
        min(c).cast(StringType).as("dict_min"),
        max(c).cast(StringType).as("dict_max"))
      val outCols = Seq(col("dict_count"), col("dict_countmissing"),
        col("dict_mean"), col("dict_stddev"), col("dict_min"),
        col("dict_max"), col("dict_countdistinct"))
      if (fixedWidth) {
        val aggs = statAggs :+
          (if (exactDistinct) count_distinct(c) else approx_count_distinct(c))
            .as("dict_countdistinct")
        narrow.agg(aggs.head, aggs.tail: _*)
          .select(lit(f.name).as("dict_field") +: outCols: _*)
      } else {
        val statRow = narrow.agg(statAggs.head, statAggs.tail: _*)
        val cdRow =
          if (exactDistinct)
            narrow.where(c.isNotNull).distinct()
              .agg(count(lit(1)).as("dict_countdistinct"))
          else narrow.agg(approx_count_distinct(c).as("dict_countdistinct"))
        statRow.crossJoin(cdRow)
          .select(lit(f.name).as("dict_field") +: outCols: _*)
      }
    }.reduce(_.unionAll(_))

    render(stats, df.sparkSession, fields.map(_.name),
      metadata, varMapping, transformDescr, defaultVarGroup)
  }

  /** Shared dictionary tail: join per-field metadata + lineage (a broadcast
    * tiny frame, one row per column — mirroring the reference's
    * literal-injection per subquery), infer widget types, project the
    * canonical column order.
    */
  private def render(
      stats: DataFrame,
      spark: org.apache.spark.sql.SparkSession,
      fieldNames: Seq[String],
      metadata: Map[String, StdVar],
      varMapping: Map[String, String],
      transformDescr: Map[String, String],
      defaultVarGroup: String): DataFrame = {
    import spark.implicits._
    val metaRows = fieldNames.map { name =>
      val m = metadata.get(name)
      val mapping = varMapping.get(name).map(o => s"Source $o. ").getOrElse("") +
        transformDescr.getOrElse(name, "Variable value unchanged from source dataset.")
      (
        name,
        m.map(_.group).getOrElse(defaultVarGroup),
        m.map(_.varType.serialize).getOrElse("unknown"),
        m.map(_.descr).getOrElse("unknown"),
        // Python-bool capitalization preserved: the webapp compares 'True'.
        m.map(v => if (v.uiFilter) "True" else "False").getOrElse("True"),
        mapping,
      )
    }.toDF("dict_field", "dict_vargroup", "dict_vartype", "dict_vardescr", "dict_uifilter", "dict_varmapping")

    val joined = stats.join(broadcast(metaRows), Seq("dict_field"), "left")

    inferUnknownVarTypes(joined).select(
      "dict_field", "dict_count", "dict_countdistinct", "dict_countmissing",
      "dict_mean", "dict_stddev", "dict_min", "dict_max",
      "dict_vargroup", "dict_vardescr", "dict_uifilter", "dict_varmapping",
      "dict_vartype")
  }

  // ---------------------------------------------------------------------
  // Incremental dictionary maintenance — the 100 TB update path. A growing
  // corpus (daily partitions, a stream) cannot re-profile from scratch per
  // update; every statistic here is carried in a MERGEABLE form instead:
  // counts and moments as sums, min/max as rendered strings merged under
  // the field's own ordering, distinct counts as DataSketches HLL sketches
  // (binary, mergeable via hll_union_agg — the standard mergeable-sketch
  // design). Maintaining the dictionary is then: profile the NEW partition
  // only, merge two tiny per-column tables, finalize — no corpus re-scan.
  // ---------------------------------------------------------------------

  /** One mergeable profile row per column of `df`:
    * `(dict_field, inc_numeric, inc_count, inc_missing, inc_sum, inc_sumsq,
    * inc_min, inc_max, inc_hll)`. One scan-only pass (same shape as
    * [[profile]]'s base aggregate); values are hashed into the HLL sketch
    * via their injective string rendering, so text and numeric columns
    * sketch uniformly.
    */
  def profileIncrement(df: DataFrame): DataFrame = {
    val fields = df.schema.fields
    require(fields.nonEmpty, "profileIncrement: empty schema")
    // One branch per column, same plan-shape rationale as [[profile]]: the
    // string min/max and binary HLL buffers force a wide single agg out of
    // HashAggregate + codegen, and the branch's scan prunes to its column.
    fields.map { f =>
      val c = col("_c")
      val numeric = isNumeric(f.dataType)
      val cd = c.cast(DoubleType)
      df.select(col(s"`${f.name}`").as("_c"))
        .agg(
          count(c).as("inc_count"),
          sum(when(c.isNull, 1).otherwise(0)).cast(LongType).as("inc_missing"),
          (if (numeric) sum(cd) else lit(null).cast(DoubleType)).as("inc_sum"),
          (if (numeric) sum(cd * cd) else lit(null).cast(DoubleType)).as("inc_sumsq"),
          min(c).cast(StringType).as("inc_min"),
          max(c).cast(StringType).as("inc_max"),
          hll_sketch_agg(c.cast(StringType)).as("inc_hll"))
        .select(lit(f.name).as("dict_field"), lit(numeric).as("inc_numeric"),
          col("inc_count"), col("inc_missing"), col("inc_sum"), col("inc_sumsq"),
          col("inc_min"), col("inc_max"), col("inc_hll"))
    }.reduce(_.unionAll(_))
  }

  /** Merge any number of increments (per-partition, per-day, per-batch)
    * into one. Counts and moments add; min/max merge under the numeric
    * order for numeric fields (via `min_by`/`max_by` on the parsed value,
    * preserving the original rendering) and lexicographically for text;
    * sketches union. Associative and commutative — merge order never
    * changes the result.
    */
  def mergeIncrements(increments: DataFrame*): DataFrame = {
    require(increments.nonEmpty, "mergeIncrements: no increments")
    increments.reduce(_.unionByName(_))
      .groupBy("dict_field")
      .agg(
        first("inc_numeric").as("inc_numeric"),
        sum("inc_count").as("inc_count"),
        sum("inc_missing").as("inc_missing"),
        sum("inc_sum").as("inc_sum"),
        sum("inc_sumsq").as("inc_sumsq"),
        // try_cast: the aggregate's ordering expression evaluates for text
        // fields too (the `when` selects AFTER aggregation), and renderings
        // of numeric values always parse
        when(first("inc_numeric"),
          min_by(col("inc_min"), expr("try_cast(inc_min AS double)")))
          .otherwise(min("inc_min")).as("inc_min"),
        when(first("inc_numeric"),
          max_by(col("inc_max"), expr("try_cast(inc_max AS double)")))
          .otherwise(max("inc_max")).as("inc_max"),
        hll_union_agg(col("inc_hll")).as("inc_hll"))
  }

  /** Mergeable numeric QUANTILES — the percentile side of incremental
    * dictionary maintenance. Min/max alone make poor range-widget bounds at
    * scale (one outlier row stretches the slider to uselessness); the
    * robust bounds are percentiles (p1/p99), and the mergeable form is a
    * KLL sketch (DataSketches, built into Spark 4 as `kll_sketch_agg_*` /
    * `kll_merge_agg_*`) — same maintenance contract as the HLL distincts:
    * profile only the new partition, merge kilobyte sketch rows, never
    * re-scan the corpus. One row per NUMERIC column: `(dict_field,
    * inc_kll)`.
    */
  def quantileIncrement(df: DataFrame): DataFrame = {
    val numeric = df.schema.fields.filter(f => isNumeric(f.dataType))
    require(numeric.nonEmpty, "quantileIncrement: no numeric columns")
    // Per-column branches (same plan-shape rationale as [[profile]]).
    numeric.map { f =>
      df.select(col(s"`${f.name}`").cast(DoubleType).as("_c"))
        .agg(expr("kll_sketch_agg_double(_c)").as("inc_kll"))
        .select(lit(f.name).as("dict_field"), col("inc_kll"))
    }.reduce(_.unionAll(_))
  }

  /** Merge quantile increments (associative/commutative, like
    * [[mergeIncrements]]).
    */
  def mergeQuantileIncrements(increments: DataFrame*): DataFrame = {
    require(increments.nonEmpty, "mergeQuantileIncrements: no increments")
    increments.reduce(_.unionByName(_))
      .groupBy("dict_field")
      .agg(expr("kll_merge_agg_double(inc_kll)").as("inc_kll"))
  }

  /** Render a (merged) quantile increment as `(dict_field, p<NN>...)` —
    * one estimate column per requested probability.
    */
  def finalizeQuantiles(
      inc: DataFrame,
      probs: Seq[Double] = Seq(0.01, 0.25, 0.5, 0.75, 0.99)): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p >= 0 && p <= 1), "probs must be in [0,1]")
    val qs = probs.map { p =>
      val name = "p" + BigDecimal(p * 100).underlying.stripTrailingZeros.toPlainString.replace(".", "_")
      expr(s"kll_sketch_get_quantile_double(inc_kll, cast($p as double))").as(name)
    }
    inc.select(col("dict_field") +: qs: _*)
  }

  /** Render a (merged) increment as a standard dictionary. Mean and
    * population stddev come from the merged moments
    * (`σ² = Σx²/n − (Σx/n)²`, clamped at 0 against float cancellation);
    * distinct counts are the sketch estimates.
    */
  def finalizeIncrement(
      inc: DataFrame,
      metadata: Map[String, StdVar] = HarmonizedSchema.byName,
      varMapping: Map[String, String] = Map.empty,
      transformDescr: Map[String, String] = Map.empty,
      defaultVarGroup: String = "dataset"): DataFrame = {
    val spark = inc.sparkSession
    val mean = when(col("inc_count") > 0, col("inc_sum") / col("inc_count"))
    val variance = greatest(
      col("inc_sumsq") / col("inc_count") - mean * mean, lit(0.0))
    val stats = inc.select(
      col("dict_field"),
      col("inc_count").as("dict_count"),
      // an all-null column aggregates to a null sketch → 0 distincts
      coalesce(hll_sketch_estimate(col("inc_hll")), lit(0L)).as("dict_countdistinct"),
      col("inc_missing").as("dict_countmissing"),
      mean.as("dict_mean"),
      when(col("inc_count") > 0, sqrt(variance)).as("dict_stddev"),
      col("inc_min").as("dict_min"),
      col("inc_max").as("dict_max"))
    val fieldNames = inc.select("dict_field").distinct()
      .collect().map(_.getString(0)).toSeq.sorted
    render(stats, spark, fieldNames, metadata, varMapping, transformDescr, defaultVarGroup)
  }

  /** Best-guess widget type for `unknown` fields from their distribution —
    * restates the reference's CASE (`harmonizeCrimeIncidents.py:389-405`):
    * no mean → `text`; exactly {0,1} → `boolean`; more distincts than the
    * integer span → continuous `range,0,floor(max+1),0.1`; otherwise a
    * stepped `range,0,floor((max/10)+1)*10,1`.
    */
  def inferUnknownVarTypes(dict: DataFrame): DataFrame = {
    val unknown = col("dict_vartype") === "unknown"
    val minD = col("dict_min").cast(DoubleType)
    val maxD = col("dict_max").cast(DoubleType)
    val inferred =
      when(unknown && col("dict_mean").isNull, lit("text"))
        .when(unknown && col("dict_countdistinct") === 2 && minD === 0 && maxD === 1, lit("boolean"))
        .when(unknown && col("dict_countdistinct") > (lit(1) + maxD - minD),
          concat(lit("range,0,"), floor(maxD + 1).cast(StringType), lit(",0.1")))
        .when(unknown,
          concat(lit("range,0,"), (floor((maxD / 10) + 1) * 10).cast(StringType), lit(",1")))
        .otherwise(col("dict_vartype"))
    dict.withColumn("dict_vartype", inferred)
  }

  /** Profile a [[Harmonizer]] pipeline result, threading its lineage into
    * `dict_varmapping`.
    */
  def profileHarmonized(h: Harmonizer, exactDistinct: Boolean = true): DataFrame =
    profile(
      h.df,
      varMapping = h.varMap,
      transformDescr = h.transformDescrs.map { case (k, v) => k -> v.mkString("; ") },
      exactDistinct = exactDistinct)

  /** Warm dictionary serving: the profiled dictionary pinned as a cached
    * temp view. The reference serves its dictionary from a hot Elasticsearch
    * index (the `*dictionary*` pattern, `services/webapp/src/config.js:22`) —
    * it never re-profiles the corpus per request; profiling happens once at
    * harmonization time and the serving half reads the tiny at-rest result.
    * Same shape here: the FIRST call pays the profile scan and publishes the
    * RESULT (one row per column — kilobytes) as a local relation; every later
    * dictionary fetch, widget compile, or typeahead-over-dictionary reads
    * that at-rest copy. Publishing the rows, not a cached lazy plan, matters
    * for serving latency: a cached view still drags the full profile plan
    * (dozens of per-column aggregate legs) through analysis and cache lookup
    * on EVERY fetch — ~1 s of driver time per page load at 16 columns ×
    * 3 datasets — whereas a local relation analyzes in ~1 ms. The collect is
    * bounded by the source SCHEMA width (one row per column), never by data
    * volume, so it is safe at any corpus scale. Idempotent per `viewName`.
    *
    * `df` is by-name so the warm path never constructs the corpus scan.
    */
  def materializeProfile(
      spark: org.apache.spark.sql.SparkSession,
      df: => DataFrame,
      viewName: String,
      exactDistinct: Boolean = true): DataFrame = {
    if (!spark.catalog.tableExists(viewName)) {
      val computed = profile(df, exactDistinct = exactDistinct)
      publishResult(spark, computed, viewName)
    }
    spark.table(viewName)
  }

  /** Pin a schema-bounded result frame as a local-relation temp view: the
    * "stored in the hot index" half of the serving contract. `maxRows` is a
    * self-enforced bound — a frame wider than it is NOT schema-bounded and
    * must not be collected to the driver.
    */
  def publishResult(
      spark: org.apache.spark.sql.SparkSession,
      result: DataFrame,
      viewName: String,
      maxRows: Int = 10000): DataFrame = {
    val rows = result.limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"publishResult($viewName): ${rows.length} rows exceeds the $maxRows " +
        "schema-bounded serving limit — this frame is data-sized, not dictionary-sized")
    val local = spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), result.schema)
    local.createOrReplaceTempView(viewName)
    spark.table(viewName)
  }

  /** Typed view of a dictionary frame. */
  def asEntries(dict: DataFrame): org.apache.spark.sql.Dataset[DictEntry] = {
    val spark = dict.sparkSession
    import spark.implicits._
    dict.as[DictEntry]
  }

  /** Parsed widget types per field — the hook the query layer uses to decide
    * predicate forms (see [[graft.query.FilterSpec]]).
    */
  def varTypes(dict: DataFrame): Map[String, VarType] =
    dict.select("dict_field", "dict_vartype").collect()
      .map(r => r.getString(0) -> VarType.parse(r.getString(1))).toMap

  /** A4 — distinct non-empty values of a column, collected sorted: the
    * reference's enum-list builder (`harmonizeCrimeIncidents.py:332-335`,
    * `rdd.map(r[0]).collect()` + Python sort — here the distinct, filter,
    * sort, and limit all run on executors; only the final list is
    * collected). `limit` bounds the driver at scale: a column with more
    * distinct values than a UI can render is not an enum.
    */
  def uniqueValues(df: DataFrame, column: String, limit: Int = 1000): Seq[String] =
    df.select(col(s"`$column`").cast(StringType).as("v"))
      .where(col("v").isNotNull && col("v") =!= "")
      .distinct()
      .orderBy("v")
      .limit(limit)
      .collect()
      .map(_.getString(0))
      .toSeq
}
