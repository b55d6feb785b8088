package graft

import graft.query.{Aggs, FilterSpec}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Physical-plan hygiene: the properties that make these operators hold at
  * 100 TB — filter/column pushdown into the parquet scan, broadcast joins for
  * small dimensions, custom expressions inside whole-stage codegen, no
  * cartesian products where a hash join is intended. Asserted on
  * `explain("formatted")` output so regressions surface in CI, not in prod.
  */
class PlanSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmp(df: DataFrame): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_plan_spec").toFile
    d.deleteOnExit()
    val p = d.getAbsolutePath + "/t.parquet"
    df.write.mode("overwrite").parquet(p)
    p
  }

  private def planOf(df: DataFrame): String = {
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) { df.explain("formatted") }
    out.toString
  }

  private lazy val factPath = tmp(Seq(
    (1L, "Theft", 10.0, ts("2016-01-01 01:00:00")),
    (2L, "Assault", 55.0, ts("2016-06-01 01:00:00")),
  ).toDF("id", "description", "amount", "datetime"))

  test("compiled FilterSpec predicates push down into the parquet scan") {
    val df = spark.read.parquet(factPath)
      .where(FilterSpec.And(Seq(
        FilterSpec.NumericRange("amount", 5, 60),
        FilterSpec.EnumIn("description", Seq("Theft", "Assault")))).compile)
    val plan = planOf(df)
    assert(plan.contains("PushedFilters:"), plan)
    assert(plan.contains("GreaterThanOrEqual(amount,5"), s"range not pushed:\n$plan")
    assert(plan.contains("In(description"), s"IN not pushed:\n$plan")
    // single-value enums fold to an equality pushdown
    val one = planOf(spark.read.parquet(factPath)
      .where(FilterSpec.EnumIn("description", Seq("Theft")).compile))
    assert(one.contains("EqualTo(description,Theft)"), one)
  }

  test("geohash zoom viewport pushes lat/lon range predicates into the scan") {
    val geoPath = tmp(Seq(
      (39.29, -76.61), (39.28, -76.60), (-33.86, 151.20),
    ).toDF("lat", "lon"))
    val plan = planOf(Aggs.geohashGridDrilldown(
      spark.read.parquet(geoPath), "lat", "lon", cell = "d"))
    assert(plan.contains("PushedFilters:"), plan)
    assert(plan.contains("GreaterThanOrEqual(lat,0"), s"lat lower bound not pushed:\n$plan")
    assert(plan.contains("LessThan(lat,45"), s"lat upper bound not pushed:\n$plan")
    assert(plan.contains("GreaterThanOrEqual(lon,-90"), s"lon lower bound not pushed:\n$plan")
    assert(plan.contains("LessThan(lon,-45"), s"lon upper bound not pushed:\n$plan")
  }

  test("aggregation prunes unread columns at the scan (ReadSchema)") {
    val df = Aggs.termsTopN(spark.read.parquet(factPath), "description", 10)
    val read = planOf(df).linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("description"), read)
    assert(!read.contains("amount") && !read.contains("datetime"),
      s"scan reads pruned columns: $read")
  }

  test("small-dimension joins broadcast (no shuffle of the fact side)") {
    val dim = Seq((1L, "baltimore")).toDF("key", "city")
    val fact = spark.read.parquet(factPath)
    val joined = fact.join(broadcast(dim), col("id") === col("key"))
    val plan = planOf(joined)
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("custom expressions stay inside whole-stage codegen") {
    // Parquet-backed input: a LocalTableScan would be folded eagerly by
    // ConvertToLocalRelation and show no codegen at all. AQE annotates
    // codegen only at execution, so disable it for the static plan check.
    val path = tmp(Seq((39.29, -76.61), (42.33, -83.04)).toDF("lat", "lon"))
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = planOf(Aggs.geohashGrid(spark.read.parquet(path), "lat", "lon", 2))
      // `*` marks a codegen'd node: the partial aggregate computing the
      // geohash grouping key must be inside a whole-stage-codegen span.
      assert(plan.contains("* HashAggregate"), plan)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("nestedTermsTopK broadcasts the tiny parent-totals side") {
    val df = Seq(("a", "x"), ("a", "y"), ("b", "x")).toDF("p", "c")
    val plan = planOf(Aggs.nestedTermsTopK(df, "p", "c", 2, 2))
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("partitioned tables prune partitions for dictionary-typed filters") {
    val dir = java.nio.file.Files.createTempDirectory("graft_prune").toFile
    dir.deleteOnExit()
    val p = dir.getAbsolutePath + "/t"
    Seq(("b1", "baltimore", 2016), ("d1", "detroit", 2017))
      .toDF("id", "city", "year")
      .write.partitionBy("city").parquet(p)
    val df = spark.read.parquet(p)
      .where(FilterSpec.EnumIn("city", Seq("baltimore")).compile)
    val plan = planOf(df)
    val pf = plan.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("city"), s"partition filter not applied:\n$plan")
    // only the matching partition directory is scanned
    assert(df.count() === 1)
  }

  test("ivfRadius over a cell-partitioned index dynamically prunes to the probed cells") {
    // The 100 TB radius-serving claim: with the at-rest IVF index
    // partitioned by `cell`, the probe join's cell keys reach the index
    // SCAN as a dynamic partition filter — unprobed cells are never read.
    val vecs = spark.range(64).select(col("id").as("vec_id"),
      array(cos(col("id") * 0.1), sin(col("id") * 0.1), lit(0.0), lit(0.0))
        .as("embedding"))
    val cents = graft.ops.Similarity.kmeansCentroids(
      vecs, "vec_id", "embedding", k = 8, iters = 0)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_dpp").toFile
    dir.deleteOnExit()
    val p = dir.getAbsolutePath + "/idx"
    graft.ops.Similarity.assignCells(vecs, "vec_id", "embedding", cents)
      .write.partitionBy("cell").parquet(p)
    val out = graft.ops.Similarity.ivfRadius(spark.read.parquet(p), cents,
      vecs.where(col("vec_id") < 2), "vec_id", "embedding",
      minCosine = 0.9, nprobe = 2)
    val plan = planOf(out)
    assert(plan.contains("dynamicpruning"),
      s"index scan lacks a dynamic cell-pruning partition filter:\n$plan")
    assert(out.count() > 0)
  }

  test("co-bucketed tables join without an exchange on either side") {
    graft.store.TableStore.recreateDatabase(spark, "graft_bkt")
    val docs = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val feats = Seq((1L, 0.9), (2L, 0.4)).toDF("doc_id", "quality")
    graft.store.TableStore.saveAsBucketedTable(docs, "graft_bkt", "docs", Seq("doc_id"), 4)
    graft.store.TableStore.saveAsBucketedTable(feats, "graft_bkt", "feats", Seq("doc_id"), 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force a real join
    try {
      val joined = spark.table("graft_bkt.docs")
        .join(spark.table("graft_bkt.feats"), "doc_id")
      val plan = planOf(joined)
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      assert(joined.count() === 2)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("pair operators end without a terminal global sort") {
    // Deterministic ordering is a harness concern: the operators themselves
    // must not range-partition (global orderBy) their full pair output.
    val docs = Seq((1L, "a b c d"), (2L, "a b c e"), (3L, "x y z w"))
      .toDF("doc_id", "text")
    val plan = planOf(graft.ops.Dedup.minhashNearDupPairs(
      docs, "doc_id", "text", threshold = 0.5, shingleK = 2))
    assert(!plan.contains("rangepartitioning"),
      s"global sort in pair-operator plan:\n$plan")
  }

  test("exact dedup collapses duplicates map-side with a single shuffle") {
    val df = Seq((1L, "t")).toDF("id", "text")
    val plan = planOf(graft.ops.Dedup.exact(df, Seq("text"), "id"))
    // one Exchange on the key, and a partial aggregate BEFORE it — the
    // map-side combine that keeps a hot key's clone set from concentrating
    // on one reducer (a window row_number would ship every duplicate).
    val exchanges = plan.linesIterator.count(_.trim.startsWith("Exchange"))
    assert(exchanges <= 1, s"expected <=1 shuffle, got $exchanges:\n$plan")
    assert(plan.contains("partial_min_by") || plan.contains("Partial"),
      s"no map-side partial aggregate in exact-dedup plan:\n$plan")
  }

  test("dictionary profile plans per-column codegen branches: no Expand, no wide SortAggregate") {
    // The cold-path contract behind q8_dict_fetch's 0.5 s (was 2.5 s): each
    // column is a narrow branch whose scan prunes to that column. An Expand
    // is the multi-distinct blow-up; a SortAggregate naming many aggregate
    // functions is the wide-plan fallback (string min/max buffers kill
    // HashAggregate) — both regressions this pin exists to catch.
    val path = tmp(Seq((1L, "a", 2.5), (2L, "b", 3.5)).toDF("id", "name", "amount"))
    val df = spark.read.parquet(path)
    val plan = planOf(graft.dict.Dictionary.profile(df))
    assert(!plan.contains("Expand"), s"Expand in profile plan:\n$plan")
    // every aggregate node should carry ONE column's functions — the wide
    // fallback names aggregates of several source columns in one node
    val wideAgg = plan.linesIterator.exists(l =>
      l.contains("SortAggregate") && l.contains("min(") &&
        Seq("id", "name", "amount").count(l.contains) > 1)
    assert(!wideAgg, s"wide multi-column SortAggregate in profile plan:\n$plan")
    // per-column scans prune: some scan reads ONLY the numeric column
    assert(plan.contains("ReadSchema: struct<amount:double>"),
      s"no single-column pruned scan in profile plan:\n$plan")
  }

  test("warm dashboard refresh plans entirely over the in-memory cache") {
    // The §3.3 serving guarantee: once primed, one dashboard interaction
    // (five visualizations under a fresh filter) must not touch a file
    // source — every leg reads the pinned federated view, like the
    // reference serving from its hot index.
    val q = SparkEntry.queries("dashboard_refresh_warm")
    q(spark, "unused").count() // prime: builds + pins view and dictionaries
    // Leaf check on the physical plan: InMemoryTableScan is a LEAF — the
    // cache-build subtree explain prints beneath InMemoryRelation is not
    // executed, so a text search for "Scan csv" would false-positive.
    val leaves = q(spark, "unused").queryExecution.sparkPlan.collectLeaves()
    assert(leaves.nonEmpty)
    assert(leaves.forall(l => l.nodeName.contains("In-memory table") ||
        l.nodeName.contains("InMemoryTableScan") || l.nodeName.contains("LocalTableScan")),
      s"warm dashboard reads a non-cache source: ${leaves.map(_.nodeName).distinct}")
  }

  test("preagg dashboard refresh reads ONLY the rollup — no corpus source in the plan") {
    // The 100 TB serving claim: once the rollup is built (the one corpus
    // scan, paid at ingest), a dashboard interaction's plan has a single
    // kind of leaf — the in-memory rollup table. Unlike the warm path this
    // does not pin the corpus projection, only |distinct dim combos| rows.
    val q = SparkEntry.queries("dashboard_refresh_preagg")
    q(spark, "unused").count() // prime: builds the rollup + dictionaries
    val leaves = q(spark, "unused").queryExecution.sparkPlan.collectLeaves()
    assert(leaves.nonEmpty)
    assert(leaves.forall(l => l.nodeName.contains("In-memory table") ||
        l.nodeName.contains("InMemoryTableScan") || l.nodeName.contains("LocalTableScan")),
      s"preagg dashboard reads a non-rollup source: ${leaves.map(_.nodeName).distinct}")
    // the serving plan resolves through the rollup view, not the pinned
    // corpus projection the warm path uses
    val analyzed = q(spark, "unused").queryExecution.analyzed.toString
    assert(!analyzed.contains("graft_dashboard_fed"),
      "preagg dashboard must not depend on the pinned corpus projection")
    assert(spark.table("graft_dashboard_preagg").columns.contains("cnt"))
    // the rollup-served typeahead holds to the same contract
    val ta = SparkEntry.queries("g7_typeahead_preagg")
    ta(spark, "unused").count()
    val taLeaves = ta(spark, "unused").queryExecution.sparkPlan.collectLeaves()
    assert(taLeaves.nonEmpty && taLeaves.forall(l =>
        l.nodeName.contains("In-memory table") ||
        l.nodeName.contains("InMemoryTableScan") || l.nodeName.contains("LocalTableScan")),
      s"preagg typeahead reads a non-rollup source: ${taLeaves.map(_.nodeName).distinct}")
  }

  test("salted join repartitions on (key, salt), not the key alone") {
    // SHUFFLE_HASH hint defeats the auto-broadcast these tiny frames would
    // get, exposing the exchange the salt exists to widen.
    val left = Seq((1L, 10L), (1L, 11L), (2L, 20L)).toDF("k", "row_id")
    val right = Seq((1L, "a"), (2L, "b")).toDF("k", "name")
    val plan = planOf(graft.ops.Joins.saltedEquiJoin(
      left.hint("SHUFFLE_HASH"), right, Seq("k"), "row_id", numSalts = 4))
    val exchangeKeys = plan.linesIterator
      .filter(l => l.contains("Arguments: hashpartitioning"))
      .mkString("\n")
    assert(exchangeKeys.contains("_salt"),
      s"join exchange does not include the salt:\n$plan")
  }

  test("the composed prep pipeline stays at two shuffles: dedup window + final agg") {
    // fingerprint dedup → quality floor → language filter → split → counts:
    // the filters and the split predicate are row-local Column algebra, so
    // they fuse into the scan/dedup stages instead of adding exchanges.
    val docs = Seq((1L, "the quick brown fox and the lazy dog", "s0"))
      .toDF("doc_id", "text", "source")
    val deduped = graft.ops.Dedup.exactByFingerprint(docs, "text", "doc_id")
    val kept = deduped.where(
      graft.ops.TextAnalysis.qualityScore(col("text")) >= 0.6 &&
        graft.ops.TextAnalysis.languageId(col("text")) === "en")
    val out = graft.ops.Sampling.assignSplit(kept, "doc_id",
        Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125))
      .groupBy("split", "source").agg(count(lit(1)).as("n"))
    val plan = planOf(out)
    val exchanges = plan.linesIterator.count(_.trim.startsWith("Exchange"))
    assert(exchanges <= 2, s"expected <=2 shuffles, got $exchanges:\n$plan")
  }

  test("llm prep pipeline: one corpus shuffle, no Expand, agg rides bucket clustering") {
    // filters → fingerprint dedup → decontaminate (broadcast) → packing →
    // fill stats. The stats aggregate must NOT re-exchange (it is clustered
    // by the packing window's bucket key) and must not Expand (the
    // countDistinct formulation would); contamination ids must come from
    // the PRE-dedup frame so the fingerprint exchange appears exactly once.
    val docs = Seq(
      (0L, "benchmark prompt text that is long enough for grams", "s0"),
      (1L, "the quick brown fox and the lazy dog again", "s0"),
      (2L, "the quick brown fox and the lazy dog again", "s1")
    ).toDF("doc_id", "text", "source")
    val filtered = docs.where(graft.ops.TextAnalysis.qualityScore(col("text")) >= 0.0)
    val deduped = graft.ops.Dedup.exactByFingerprint(filtered, "text", "doc_id")
    val bench = docs.where(col("doc_id") % 97 === 0)
    val flagged = graft.ops.Decontaminate.overlaps(filtered, "doc_id", "text",
      bench, "text", n = 8).select("doc_id")
    val clean = deduped.join(broadcast(flagged), Seq("doc_id"), "left_anti")
    val packed = graft.ops.Packing.packConcatChunk(clean, "doc_id",
      graft.ops.TextAnalysis.tokenCount(col("text")), seqLen = 5, numBuckets = 2)
    val out = packed.groupBy("bucket").agg(
      sum(when(col("slice_begin") === 0, 1L).otherwise(0L)).as("n_docs"),
      (max(col("seq")) + 1).as("n_seqs"),
      sum("slice_len").as("n_tokens"))
    val plan = planOf(out)
    assert(!plan.contains("Expand"), s"countDistinct Expand crept back in:\n$plan")
    assert(plan.contains("LeftAnti"), s"decontamination anti-join missing:\n$plan")
    val fpExchanges = "hashpartitioning\\(_fp".r.findAllIn(plan).length
    assert(fpExchanges == 1, s"fingerprint shuffle must run once, got $fpExchanges:\n$plan")
    val bucketExchanges = "hashpartitioning\\(_bucket".r.findAllIn(plan).length
    assert(bucketExchanges == 1,
      s"stats agg must reuse the window's bucket clustering, got $bucketExchanges:\n$plan")
  }

  test("rollup/cube execute as ONE Expand over one aggregation — no per-level rescan") {
    val df = Seq(("a", "x"), ("b", "y")).toDF("k1", "k2")
    for (cube <- Seq(false, true)) {
      val plan = planOf(Aggs.rollupCounts(df, Seq("k1", "k2"), cube = cube))
      assert("Expand".r.findAllIn(plan).length >= 1, plan)
      // one Expand node, one pair of partial/final HashAggregates — a
      // union-of-levels formulation would multiply both
      assert("\\(\\d+\\) Expand".r.findAllIn(plan).length == 1,
        s"grouping sets must expand once:\n$plan")
      assert("\\(\\d+\\) HashAggregate".r.findAllIn(plan).length == 2,
        s"one partial+final agg pair expected:\n$plan")
    }
  }

  test("shard assignments: ONE exchange, on the shard key") {
    val docs = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val plan = planOf(graft.ops.Packing.shardAssignments(docs, "doc_id", 4))
    val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected exactly 1 exchange:\n$plan")
    assert(plan.contains("hashpartitioning(shard"),
      s"the one exchange must key on the shard:\n$plan")
  }

  test("token budget: bucket offsets broadcast; corpus windows partition by (source, bucket)") {
    val docs = Seq((1L, "a", "w w w"), (2L, "b", "w w"), (3L, "a", "w"))
      .toDF("doc_id", "source", "text")
    val plan = planOf(graft.ops.Sampling.tokenBudgetSelect(docs, "doc_id",
      "source", graft.ops.TextAnalysis.tokenCount(col("text")), budget = 4L,
      numBuckets = 4))
    // the sources×B offsets frame arrives at the corpus by broadcast, and
    // the corpus-side window is keyed (source, bucket) — never one global
    // or per-source-only partition
    assert(plan.contains("BroadcastExchange"), s"offsets must broadcast:\n$plan")
    assert("windowspecdefinition\\(source#\\d+, _bucket#\\d+L".r
      .findFirstIn(plan).isDefined,
      s"corpus window must partition by (source, bucket):\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"offset join must not sort-merge the corpus:\n$plan")
  }

  test("published assembly reads the checkpointed stage tables, never the corpus") {
    // pipeline_assemble_published is the lazy DAG's 100 TB deployment
    // shape: stage boundaries land as parquet tables and the final
    // manifest's plan must scan THOSE — the lazy form's 18 re-derivations
    // of `documents` are exactly what the layout exists to avoid.
    val df = SparkEntry.queries("pipeline_assemble_published")(
      spark, "/root/testdata/sf0.001")
    val plan = planOf(df)
    assert(plan.contains("graft_assemble_pub"),
      s"final stage must read the published stage tables:\n$plan")
    assert(!plan.contains("documents.parquet"),
      s"final stage must not re-derive from the corpus:\n$plan")
  }

  test("boilerplate profile broadcasts the Zipf head, never shuffles the corpus twice") {
    val docs = Seq(
      (1L, "visit our website today alpha beta"),
      (2L, "visit our website today gamma delta"),
      (3L, "unique text one two three four")
    ).toDF("doc_id", "text")
    val plan = planOf(graft.ops.TextAnalysis.boilerplateProfile(
      docs, "doc_id", "text", n = 3, minDocFrac = 0.5))
    // the frequent-gram set and the ndocs scalar both arrive by broadcast;
    // the gram stream itself is exchanged only for the df count — the
    // per-doc rollup hashes on doc id, not on grams again
    assert("BroadcastExchange".r.findAllIn(plan).length >= 2,
      s"frequent set + ndocs must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"gram join must not sort-merge the corpus:\n$plan")
  }

  test("drift report scans each snapshot once, regardless of feature count") {
    // The unpivoted single-pass form: F features must NOT cost 2F corpus
    // scans (the round-12 verdict measured the per-feature union at 2
    // scans per feature per side). One exploded histogram aggregation per
    // side; the per-feature totals reuse the histogram exchange.
    val docs = Seq(
      (1L, "en", "web", 5), (2L, "de", "web", 12),
      (3L, "en", "book", 25), (4L, "fr", "web", 33),
    ).toDF("doc_id", "lang", "source", "ntok")
    val path = tmp(docs)
    val d = spark.read.parquet(path)
    val plan = planOf(graft.ops.Drift.driftReport(
      d.where(col("doc_id") % 2 === 0), d.where(col("doc_id") % 2 === 1),
      Seq("lang" -> col("lang"), "source" -> col("source"),
        "dec" -> (floor(col("ntok") / 10) * 10))))
    // formatted explain prints each node twice (tree line + detail
    // section) — count the numbered detail headers only
    val scans = """\(\d+\) Scan parquet""".r.findAllIn(plan).length
    assert(scans <= 2, s"expected <=2 corpus scans for 3 features, got $scans:\n$plan")
  }

  test("matrix_stats is ONE corpus scan for any field count") {
    // The full covariance/correlation matrices must not cost a scan per
    // pair: one conditional-sum aggregation carries every moment.
    val rows = Seq((1.0, 2.0, 5.0), (2.0, 4.0, 4.0), (3.0, 6.0, 3.0))
      .toDF("x", "y", "z")
    val path = tmp(rows)
    val plan = planOf(graft.query.Aggs.matrixStats(
      spark.read.parquet(path), Seq("x", "y", "z")))
    val scans = """\(\d+\) Scan parquet""".r.findAllIn(plan).length
    assert(scans === 1, s"expected 1 corpus scan for 3 fields (6 pairs), got $scans:\n$plan")
  }

  test("t_test is ONE corpus scan: both populations fold in one pass") {
    val rows = Seq(("a", 1.0), ("b", 2.0)).toDF("g", "v")
    val path = tmp(rows)
    val plan = planOf(graft.query.Aggs.tTest(
      spark.read.parquet(path), "v", col("g") === "a", col("g") === "b"))
    val scans = """\(\d+\) Scan parquet""".r.findAllIn(plan).length
    assert(scans === 1, s"expected 1 corpus scan for both populations, got $scans:\n$plan")
  }

  test("gopher battery is one row-local scan: no exchange anywhere in the plan") {
    val docs = Seq((1L, "the quick fox"), (2L, "- bullet line\nplain"))
      .toDF("doc_id", "text")
    val path = tmp(docs)
    val plan = planOf(graft.ops.TextAnalysis.gopherProfile(
      spark.read.parquet(path), "text"))
    assert(!plan.contains("Exchange"),
      s"all seven rules must fuse into the scan's projection:\n$plan")
    assert(plan.contains("[codegen id : 1]"),
      s"must fuse into one whole-stage codegen span:\n$plan")
  }

  test("semantic dedup joins on the cell key only — no cartesian product") {
    val vecs = (0L until 30L).map(i =>
      (i, Seq(1.0f + (i % 3) * 0.01f, 0.1f * (i % 2), 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val plan = planOf(graft.ops.Similarity.semanticNearDupPairs(
      vecs, "vec_id", "embedding", threshold = 0.9, nlist = 3))
    assert(!plan.contains("CartesianProduct"),
      s"within-cell pairing must join on the cell key:\n$plan")
  }

  test("query_string exists/range/wildcard clauses push down into the parquet scan") {
    val p = tmp(Seq((1L, "src1", 450L), (2L, "web", 30L)).toDF("id", "source", "n"))
    val spec = graft.query.QueryString.parse(
      "source:* AND n:[400 TO *]", defaultField = "source")
    val plan = planOf(spark.read.parquet(p).where(spec.compile))
    assert(plan.contains("PushedFilters:"), plan)
    assert(plan.contains("IsNotNull(source)"), s"exists not pushed:\n$plan")
    // UnwrapCastInBinaryComparison turns the range's double compare back
    // into a pushable long predicate
    assert(plan.contains("GreaterThanOrEqual(n,400"), s"range not pushed:\n$plan")
    // term-level wildcard is a LIKE the source can evaluate
    val w = planOf(spark.read.parquet(p).where(
      graft.query.QueryString.parse("source:s?c1*", "source").compile))
    assert(w.contains("StringStartsWith") || w.contains("LIKE") || w.contains("Like"),
      s"wildcard not pushed or evaluated at scan:\n$w")
  }

  test("percolate is ONE scan: no exchange, stored queries evaluated in-plan") {
    val docs = Seq((1L, "dup text here"), (2L, "other")).toDF("id", "text")
    val stored = graft.query.Percolator.fromStrings(
      Seq("a" -> "text:dup", "b" -> """text:"dup text""""), "text")
    val plan = planOf(graft.query.Percolator.percolateLong(docs, "id", stored))
    assert(!plan.contains("Exchange"),
      s"percolation must not shuffle — queries are plan-side:\n$plan")
    assert(!plan.contains("Join"), s"no query-table join:\n$plan")
  }

  test("search_after plans as a partial top-k, never a global sort") {
    val p = tmp(Seq((1L, 3.0), (2L, 2.0), (3L, 1.0)).toDF("id", "score"))
    val plan = planOf(graft.query.Paging.searchAfter(
      spark.read.parquet(p), "id", "score", 2.5, 1L, 2))
    assert(plan.contains("TakeOrderedAndProject"),
      s"keyset page must be a partial top-k:\n$plan")
    // and the anchor predicate reaches the scan (constant work per page)
    assert(plan.contains("PushedFilters:") && plan.contains("LessThan(score,2.5)"),
      s"anchor predicate not pushed:\n$plan")
  }

  test("collapse windows partition by the collapse field — group-parallel, no single-task sort") {
    val scored = Seq((1L, 3.0, "en"), (2L, 2.0, "fr")).toDF("id", "score", "lang")
    val plan = planOf(graft.query.Paging.collapseTopHits(
      scored, "id", "score", "lang", 5))
    assert(plan.contains("hashpartitioning(lang"),
      s"per-group argmax must partition by the collapse field:\n$plan")
  }

  test("indexed fuzzy retrieval semi-joins the corpus against broadcast matched terms") {
    val docs = Seq((1L, "dup vector"), (2L, "other words")).toDF("id", "text")
    val plan = planOf(graft.query.Fuzzy.fuzzyDocs(docs, "text", "dupe", 1))
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"matched terms must broadcast into a semi-join:\n$plan")
  }

  test("more_like_this: selected terms and corpus stats arrive by broadcast") {
    val docs = Seq(
      (1L, "rare rare common common"), (2L, "rare common zz zz"),
      (3L, "common yy"), (4L, "common xx")).toDF("id", "text")
    val plan = planOf(graft.query.MoreLikeThis.moreLikeThis(
      docs, "id", "text", 1L, maxQueryTerms = 3, k = 3,
      minTermFreq = 1, minDocFreq = 1))
    assert("BroadcastExchange".r.findAllIn(plan).length >= 2,
      s"selected terms + stats must broadcast:\n$plan")
  }

  test("importance scoring broadcasts the bucket model; corpus shuffles only by doc id") {
    val docs = Seq(
      (1L, "en", "the quick brown fox jumps over the lazy dog"),
      (2L, "xx", "buy cheap pills now click here win big prize"),
    ).toDF("doc_id", "lang", "text")
    val plan = planOf(graft.ops.Sampling.importanceScores(
      docs, "doc_id", "text", col("lang") === "en"))
    // the ≤numBuckets model (and the 1-row totals) must arrive by
    // broadcast — the exploded feature stream is never the build side of a
    // shuffled join
    assert("BroadcastExchange".r.findAllIn(plan).length >= 2,
      s"model + totals must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"feature-weight join must not sort-merge the corpus:\n$plan")
  }

  test("random projection is row-local: planes are plan literals, no key shuffle, no join") {
    val df = Seq((1L, Seq.fill(8)(0.5))).toDF("vec_id", "embedding")
    val plan = planOf(graft.ops.Similarity.randomProject(
      df, "vec_id", "embedding", outDim = 4, dim = 8))
    // the only exchange allowed is spread()'s deliberate round-robin
    // widening of a narrow input — never a key (hash/range) shuffle
    assert(!plan.contains("hashpartitioning") && !plan.contains("rangepartitioning"),
      s"projection must not key-shuffle — planes ride the plan:\n$plan")
    assert(!plan.contains("Join"), s"no plane-table join:\n$plan")
  }

  test("sq8 coding is row-local against plan-side bounds: no join, no key shuffle") {
    val df = Seq((1L, Seq(0.0, 1.0)), (2L, Seq(2.0, 3.0))).toDF("vec_id", "embedding")
    val plan = planOf(graft.ops.Similarity.sq8Codes(
      df, "vec_id", "embedding", Array(0.0, 1.0), Array(2.0, 3.0)))
    assert(!plan.contains("hashpartitioning") && !plan.contains("rangepartitioning"),
      s"coding must not key-shuffle — bounds are plan literals:\n$plan")
    assert(!plan.contains("Join"), s"no bounds join:\n$plan")
  }

  test("span/intervals proximity is a row-local scan: pruned columns, no shuffle, no join") {
    val path = tmp(Seq((1L, "spark scan merge", "en", "web", 16L))
      .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val df = spark.read.parquet(path)
      .where(graft.query.FilterSpec.SpanNear("text",
        Seq("spark", "scan", "merge"), 4, inOrder = false).compile)
      .select("doc_id", "lang")
    val plan = planOf(df)
    // the position machinery must not read beyond the filtered/selected
    // columns, and the whole predicate must evaluate at the scan — no
    // exchange, no join, no position-table materialization
    val read = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("doc_id") && read.contains("text") && read.contains("lang") &&
      !read.contains("source") && !read.contains("n_chars"),
      s"scan must read only doc_id/text/lang:\n$read")
    assert(!plan.contains("Exchange"), s"proximity must not shuffle:\n$plan")
    assert(!plan.contains("Join"), s"proximity must not join:\n$plan")
  }

  test("geo_bounding_box pushes its comparisons into the parquet scan — crossing box included") {
    val geoPath = tmp(Seq((39.29, -76.61), (10.0, 170.0)).toDF("lat", "lon"))
    val plain = planOf(spark.read.parquet(geoPath)
      .where(FilterSpec.GeoBoundingBox("lat", "lon", 60, -120, -10, -60).compile))
    assert(plain.contains("PushedFilters:"), plain)
    assert(plain.contains("LessThanOrEqual(lat,60.0)") &&
      plain.contains("GreaterThanOrEqual(lat,-10.0)") &&
      plain.contains("GreaterThanOrEqual(lon,-120.0)"),
      s"box bounds not pushed:\n$plain")
    // the antimeridian-crossing disjunction pushes as an Or
    val crossing = planOf(spark.read.parquet(geoPath)
      .where(FilterSpec.GeoBoundingBox("lat", "lon", 60, 150, -10, -120).compile))
    assert(crossing.contains("Or(GreaterThanOrEqual(lon,150.0),LessThanOrEqual(lon,-120.0))"),
      s"crossing-box lon disjunction not pushed:\n$crossing")
  }

  test("span_first / span_not / filtered intervals: row-local scan, no shuffle, no join") {
    val path = tmp(Seq((1L, "spark vector scan", "en", "web", 17L))
      .toDF("doc_id", "text", "lang", "source", "n_chars"))
    for (spec <- Seq(
        FilterSpec.SpanFirst("text", "spark", 6),
        FilterSpec.SpanNot("text", "scan", "vector scan"),
        FilterSpec.IntervalsFiltered("text", "spark scan", 5,
          "not_containing", "vector"))) {
      val plan = planOf(spark.read.parquet(path)
        .where(spec.compile).select("doc_id", "lang"))
      assert(!plan.contains("Exchange"), s"${spec.render} must not shuffle:\n$plan")
      assert(!plan.contains("Join"), s"${spec.render} must not join:\n$plan")
      val read = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
      assert(!read.contains("n_chars"), s"${spec.render} reads too much:\n$read")
    }
  }

  test("mixed-length unordered all_of is a row-local scan: pruned columns, no shuffle, no join") {
    val path = tmp(Seq((1L, "merge batch scan", "en", "web", 16L))
      .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val df = spark.read.parquet(path)
      .where(graft.query.FilterSpec.IntervalsAllOf("text",
        Seq(Seq("scan", "batch scan"), Seq("merge")), maxGaps = 0,
        ordered = false).compile)
      .select("doc_id", "lang")
    val plan = planOf(df)
    // the five-level candidate pipeline (minimize, cross-product,
    // minimality scan) must stay entirely inside the row — the quadratic
    // work is per-document HOF algebra, never a materialized join
    assert(!plan.contains("Exchange"), s"mixed all_of must not shuffle:\n$plan")
    assert(!plan.contains("Join"), s"mixed all_of must not join:\n$plan")
    val read = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("text") && !read.contains("n_chars") &&
      !read.contains("source"), s"scan reads too much:\n$read")
  }

  test("sparse rescore: broadcast term joins + a bounded top-k page cut, no corpus-wide sort") {
    val docs = Seq((1L, "vector scan vector"), (2L, "dup merge"),
      (3L, "scan scan scan"), (4L, "dup vector")).toDF("doc_id", "text")
    val postings = graft.query.SparseVector.tfPostings(docs, "doc_id", "text")
    val plan = planOf(graft.query.Hybrid.rescore(
      graft.query.SparseVector.score(postings, "doc_id",
        Seq("vector" -> 2.0, "dup" -> 0.5)), "doc_id", "score",
      graft.query.SparseVector.score(postings, "doc_id",
        Seq("scan" -> 0.25)), "score",
      windowSize = 2))
    // both sparse legs broadcast their (term, weight) literals; the run
    // is page-bounded by TakeOrderedAndProject (distributed top-k),
    // never a whole-match-set single-partition sort before the cut
    assert(plan.contains("BroadcastHashJoin"), s"term joins must broadcast:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"the page cut must be a distributed top-k:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("radius vector search broadcasts the query side — the corpus never shuffles") {
    val emb = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val plan = planOf(graft.ops.Similarity.bruteForceRadius(
      emb, "vec_id", "embedding", emb.where($"vec_id" === 1L), "vec_id", "embedding", 0.3))
    assert(plan.contains("BroadcastExchange"), s"query side must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("hashpartitioning"),
      s"corpus must not shuffle for a broadcast-side radius cut:\n$plan")
    // no window: the threshold IS the cut — no rank machinery
    assert(!plan.contains("Window"), s"radius search must not rank:\n$plan")
  }

  test("ES|QL spatial predicates are row-local arithmetic: pruned scan, no shuffle, no join") {
    val path = tmp(Seq((1L, 47.6, -122.3, "x"), (2L, 0.5, -90.0, "y"))
      .toDF("id", "lat", "lon", "extra"))
    val df = graft.query.Esql.run(
      """FROM c
        | EVAL pt = TO_GEOPOINT(CONCAT("POINT (", TO_STRING(lon), " ", TO_STRING(lat), ")"))
        | WHERE ST_INTERSECTS(pt, TO_GEOSHAPE("POLYGON ((-150 -60, -150 60, -30 60, -30 -60, -150 -60))"))
        | KEEP id""",
      _ => spark.read.parquet(path))
    val plan = planOf(df)
    // the ray cast is a codegen'd row-local predicate over derived doubles:
    // never a join, never an exchange, and KEEP prunes the unused column
    assert(!plan.contains("Exchange"), s"spatial filter must not shuffle:\n$plan")
    assert(!plan.toLowerCase.contains("join"), s"spatial filter must not join:\n$plan")
    // ("extra" also appears inside `regexp_extract`, so pin the schema line)
    assert(plan.contains("ReadSchema: struct<id:bigint,lat:double,lon:double>"),
      s"KEEP must prune the unused column from the scan:\n$plan")
  }

  test("TS gauge is two hash aggregates: no window, no explode") {
    val path = tmp(Seq(
      ("a", "g", ts("2024-03-01 10:05:00"), 1.0),
      ("b", "g", ts("2024-03-01 10:30:00"), 2.0)).toDF("uid", "etype", "ts", "v"))
    val df = graft.query.Esql.run(
      """TS e | STATS p = MAX(MAX_OVER_TIME(v, uid)) BY etype, b = BUCKET(ts, 1 hour)""",
      _ => spark.read.parquet(path))
    val plan = planOf(df)
    assert(!plan.contains("Window"), s"gauge must not window:\n$plan")
    assert(!plan.contains("Generate"), s"gauge must not explode:\n$plan")
    // formatted plans print each node in the tree AND as a detail section —
    // count the numbered detail headers only
    val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(plan).size
    assert(exchanges <= 2, s"two-level gauge should need at most two shuffles, saw $exchanges:\n$plan")
    assert(plan.contains("HashAggregate"), s"gauge must hash-aggregate:\n$plan")
  }

  test("KQL nested braces are one higher-order exists over the array: no explode, no join") {
    val items = Seq((1L, "widget", 1L), (1L, "gadget", 5L), (2L, "widget", 9L))
      .toDF("oid", "product", "qty")
    val path = tmp(graft.query.NestedDocs.nest(items, "oid", Seq("product", "qty"), as = "items"))
    val df = spark.read.parquet(path)
      .where(graft.query.Kql.parse("items:{ product:widget and qty > 2 }", None).compile)
    val plan = planOf(df)
    assert(!plan.contains("Generate"), s"nested braces must not explode the array:\n$plan")
    assert(!plan.toLowerCase.contains("join"), s"nested braces must not join:\n$plan")
    assert(!plan.contains("Exchange"), s"a nested filter is row-local:\n$plan")
  }
}
