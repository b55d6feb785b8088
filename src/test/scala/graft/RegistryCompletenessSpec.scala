package graft

import com.fasterxml.jackson.databind.ObjectMapper

/** The registry-vs-artifact completeness gate (round-11 verdict #1): a query
  * registered in [[SparkEntry.queries]] that fails at Verify time writes no
  * result dir, gets no row in the round's CORRECTNESS artifact, and ships
  * unchecked — `join_bucketed` did exactly that in round 11 (its managed
  * bucketed-table location survived a previous JVM while the fresh in-memory
  * metastore did not know the table, so saveAsTable refused). These tests
  * make that hole a BUILD failure:
  *
  *  1. every registered query executes end-to-end at sf0.001 (the same
  *     no-throw bar Verify needs at sf0.01);
  *  2. the oracle map and the registry agree, with the rows-only remainder
  *     pinned to the documented seeded-hash/codec-float set;
  *  3. every registered query has a row in the newest committed
  *     CORRECTNESS_r*.json, except queries explicitly listed as added since
  *     that artifact — and that list must shrink as artifacts land (a listed
  *     query that HAS a row fails the staleness check).
  */
class RegistryCompletenessSpec extends SparkSpecBase {

  /** Documented rows-only queries: registered, no SQL-expressible oracle.
    * Seeded-xxhash64 scale twins (each certified by a passing portable
    * oracle twin) plus the JVM-codec float slice (whose integer slice is
    * oracled as mm_meta_stats). Growing this set is a design decision, not
    * a drive-by — pin it exactly.
    */
  private val rowsOnly = Set(
    "dedup_minhash", "dedup_simhash", "dedup_cluster_keep_minhash",
    "mm_feature_stats")

  /** Queries registered after the newest committed CORRECTNESS artifact was
    * produced. Every name here is awaiting its first artifact row; once the
    * next round's artifact lands, the staleness check below forces this
    * list back toward empty.
    */
  private val newSinceLastArtifact: Set[String] = Set(
    "q_query_string", "q_query_string_default", "q_query_string_analytics",
    "q_fuzzy_match", "q_fuzzy_match_indexed", "q_phrase_slop", "q_wildcard",
    "search_more_like_this", "q_suggest_term", "q_highlight",
    "q_suggest_phrase", "search_bm25_collapse", "search_bm25_page2",
    "quality_ml_select", "q_rank_eval", "q_percolate", "corpus_diff",
    "ann_filtered", "ann_ivf_filtered", "q_ltr_features",
    "text_unigram_segment", "quality_classifier_auc",
    "quality_classifier_report", "q_fuzzy_match_damerau", "corpus_datasheet",
    "g_variable_width_histogram", "g_variable_width_histogram_preagg",
    "g_random_sampler", "g_significant_text",
    "g_weighted_avg_preagg", "g_geo_centroid_preagg", "g_matrix_stats_preagg",
    "g_string_stats_preagg", "g_date_range_preagg", "g_ip_prefix_preagg",
    "g_cumulative_cardinality", "g_bucket_correlation", "g_ks_test",
    "g_change_point", "g_cumulative_cardinality_preagg",
    "g_bucket_correlation_preagg", "g_ks_test_preagg", "g_change_point_preagg",
    "ann_ivf_sampled", "ann_lsh_probe", "join_rolling_features_chunked",
    "g_date_histogram_preagg", "g_composite_pages_preagg",
    "g_extended_stats", "g_extended_stats_preagg", "g_weighted_avg",
    "g_missing", "g_rare_terms", "g_rare_terms_preagg",
    "g_multi_terms", "g_multi_terms_preagg", "g_adjacency_matrix",
    "g_serial_diff", "q6_phrase_prefix_unicode",
    "g_sampler_terms", "g_diversified_sampler", "g_date_range",
    "g_geo_centroid", "g_date_histogram_incremental", "g_bucket_stats",
    "g_range_buckets_preagg", "g_filters_agg_preagg",
    "g_adjacency_matrix_preagg", "g_missing_preagg",
    "g_geotile_grid", "g_geotile_preagg", "g_geo_bounds", "g_top_metrics",
    "g_boxplot", "g_mad", "g_string_stats", "g_matrix_stats",
    "g_auto_date_histogram", "g_auto_date_histogram_preagg",
    "g_t_test", "g_geo_distance", "g_bucket_script",
    "dedup_duplicate_spans", "g_geotile_drilldown", "g_frequent_pairs",
    "g_moving_fn", "g_normalize", "g_rate",
    "g_categorize_text", "g_ip_prefix", "g_ip_range", "g_geo_line",
    "dedup_duplicate_spans_incremental", "pipeline_spans",
    "g_boxplot_preagg", "g_mad_preagg", "g_t_test_preagg",
    "g_geo_bounds_preagg", "g_top_metrics_preagg")

  test("every oracle key is a registered query, rows-only remainder is pinned") {
    val registered = SparkEntry.queries.keySet
    val oracled = SparkEntry.oracleSql.keySet
    val phantom = oracled -- registered
    assert(phantom.isEmpty, s"oracle SQL for unregistered queries: $phantom")
    assert((registered -- oracled) === rowsOnly,
      "registered queries without oracle SQL must be exactly the documented rows-only set")
  }

  test("every registered query has a row in the newest CORRECTNESS artifact or is declared new") {
    val artifacts = new java.io.File(".").listFiles()
      .filter(f => f.getName.matches("CORRECTNESS_r\\d+\\.json"))
      .sortBy(_.getName)
    assume(artifacts.nonEmpty, "no committed CORRECTNESS artifact to check against")
    val latest = artifacts.last
    val node = new ObjectMapper().readTree(latest)
    val inArtifact = {
      val b = Set.newBuilder[String]
      val it = node.fieldNames()
      while (it.hasNext) b += it.next()
      b.result()
    }
    val registered = SparkEntry.queries.keySet
    val unchecked = registered -- inArtifact -- newSinceLastArtifact
    assert(unchecked.isEmpty,
      s"registered queries with no row in ${latest.getName} and not declared " +
        s"newSinceLastArtifact: $unchecked — a query must never ship without a " +
        "correctness row (round-11 verdict #1)")
    val stale = newSinceLastArtifact.intersect(inArtifact)
    assert(stale.isEmpty,
      s"newSinceLastArtifact entries already present in ${latest.getName}: $stale — " +
        "remove them so the allowlist cannot mask a future hole")
    val ghosts = newSinceLastArtifact -- registered
    assert(ghosts.isEmpty, s"newSinceLastArtifact names unregistered queries: $ghosts")
  }

  test("every registered query executes end-to-end at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, dir).count(); None }
      catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty,
      s"${failures.size} registered queries fail to execute:\n${failures.mkString("\n")}")
  }
}
