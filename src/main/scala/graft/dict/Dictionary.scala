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
  * Here the profile is one single-pass `agg` with 7×N aggregate expressions,
  * unpivoted to N rows with `stack` — one scan regardless of column count,
  * which is the difference between feasible and not at 100 TB. Set
  * `exactDistinct = false` to swap `COUNT(DISTINCT)` for HyperLogLog
  * `approx_count_distinct` (the reference's exact distinct per column is a
  * full shuffle per column at scale).
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

    // Non-distinct stats: 6 narrow aggregates per column in ONE scan-only
    // pass (map-side partial + one tiny final buffer — no shuffle of data
    // rows). Aliases are positional (`_i_*`) so arbitrary source column
    // names can't collide with them. Exact COUNT(DISTINCT) is deliberately
    // NOT in this agg: N distinct aggregates in one agg make Catalyst plan
    // an Expand (×N+1 row blow-up) whose hash state holds every aggregate
    // buffer per (gid, value) group — measured 35s+ on an 11-column 600k-row
    // table. The distinct path below is a skinny unpivot instead.
    val aggs: Seq[Column] = fields.zipWithIndex.flatMap { case (f, i) =>
      val c = col(s"`${f.name}`")
      val numeric = isNumeric(f.dataType)
      Seq(
        count(c).as(s"_${i}_cnt"),
        sum(when(c.isNull, 1).otherwise(0)).cast(LongType).as(s"_${i}_miss"),
        (if (numeric) avg(c).cast(DoubleType) else lit(null).cast(DoubleType)).as(s"_${i}_mean"),
        (if (numeric) stddev_pop(c).cast(DoubleType) else lit(null).cast(DoubleType)).as(s"_${i}_std"),
        min(c).cast(StringType).as(s"_${i}_min"),
        max(c).cast(StringType).as(s"_${i}_max"),
      ) ++ (if (exactDistinct) Nil else Seq(approx_count_distinct(c).as(s"_${i}_cd")))
    }.toSeq

    val oneRow = df.agg(aggs.head, aggs.tail: _*)

    // Unpivot the single wide row into N dictionary rows.
    val stackGroups = fields.zipWithIndex.map { case (f, i) =>
      val esc = f.name.replace("'", "\\'")
      s"'$esc', _${i}_cnt, _${i}_miss, _${i}_mean, _${i}_std, _${i}_min, _${i}_max" +
        (if (exactDistinct) "" else s", _${i}_cd")
    }.mkString(", ")
    val baseStats = oneRow.selectExpr(
      s"stack(${fields.length}, $stackGroups) AS " +
        "(dict_field, dict_count, dict_countmissing, " +
        "dict_mean, dict_stddev, dict_min, dict_max" +
        (if (exactDistinct) ")" else ", dict_countdistinct)"))

    // Exact distinct counts: unpivot to skinny (field, value-as-string) rows
    // — string cast is injective for all supported types, so distinct counts
    // are unchanged — then a two-phase distinct + count per field. Two
    // shuffles of narrow rows, partial-deduped map-side; scales linearly
    // where the Expand plan died quadratically.
    val stats =
      if (!exactDistinct) baseStats
      else {
        val valueGroups = fields.map { f =>
          val esc = f.name.replace("'", "\\'")
          s"'$esc', cast(`${f.name}` as string)"
        }.mkString(", ")
        val distinctCounts = df
          .selectExpr(s"stack(${fields.length}, $valueGroups) AS (dict_field, _v)")
          .where(col("_v").isNotNull)
          .distinct()
          .groupBy("dict_field")
          .agg(count(lit(1)).as("dict_countdistinct"))
        // 1 row per column on each side — broadcast; all-null columns have
        // no distinct rows, hence the left join + 0 fill.
        baseStats.join(broadcast(distinctCounts), Seq("dict_field"), "left")
          .withColumn("dict_countdistinct",
            coalesce(col("dict_countdistinct"), lit(0L)))
      }

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
    val aggs: Seq[Column] = fields.zipWithIndex.flatMap { case (f, i) =>
      val c = col(s"`${f.name}`")
      val numeric = isNumeric(f.dataType)
      val cd = c.cast(DoubleType)
      Seq(
        count(c).as(s"_${i}_cnt"),
        sum(when(c.isNull, 1).otherwise(0)).cast(LongType).as(s"_${i}_miss"),
        (if (numeric) sum(cd) else lit(null).cast(DoubleType)).as(s"_${i}_sum"),
        (if (numeric) sum(cd * cd) else lit(null).cast(DoubleType)).as(s"_${i}_sumsq"),
        min(c).cast(StringType).as(s"_${i}_min"),
        max(c).cast(StringType).as(s"_${i}_max"),
        hll_sketch_agg(c.cast(StringType)).as(s"_${i}_hll"),
      )
    }.toSeq
    val oneRow = df.agg(aggs.head, aggs.tail: _*)
    val stackGroups = fields.zipWithIndex.map { case (f, i) =>
      val esc = f.name.replace("'", "\\'")
      s"'$esc', ${isNumeric(f.dataType)}, _${i}_cnt, _${i}_miss, " +
        s"_${i}_sum, _${i}_sumsq, _${i}_min, _${i}_max, _${i}_hll"
    }.mkString(", ")
    oneRow.selectExpr(
      s"stack(${fields.length}, $stackGroups) AS " +
        "(dict_field, inc_numeric, inc_count, inc_missing, " +
        "inc_sum, inc_sumsq, inc_min, inc_max, inc_hll)")
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
    val aggs = numeric.zipWithIndex.map { case (f, i) =>
      expr(s"kll_sketch_agg_double(cast(`${f.name}` as double))").as(s"_${i}_kll")
    }.toSeq
    val oneRow = df.agg(aggs.head, aggs.tail: _*)
    val stackGroups = numeric.zipWithIndex.map { case (f, i) =>
      s"'${f.name.replace("'", "\\'")}', _${i}_kll"
    }.mkString(", ")
    oneRow.selectExpr(
      s"stack(${numeric.length}, $stackGroups) AS (dict_field, inc_kll)")
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
    * Same shape here: the FIRST call pays the profile scan and caches the
    * result (one row per column — kilobytes); every later dictionary fetch,
    * widget compile, or typeahead-over-dictionary reads memory. Idempotent
    * per `viewName`; at 100 TB this is the difference between a sub-second
    * dashboard render and a full-corpus scan per page load.
    *
    * `df` is by-name so the cached path never constructs the corpus scan.
    */
  def materializeProfile(
      spark: org.apache.spark.sql.SparkSession,
      df: => DataFrame,
      viewName: String,
      exactDistinct: Boolean = true): DataFrame = {
    if (!spark.catalog.tableExists(viewName)) {
      profile(df, exactDistinct = exactDistinct).createOrReplaceTempView(viewName)
      spark.catalog.cacheTable(viewName)
    }
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
