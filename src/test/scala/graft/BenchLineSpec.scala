package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

/** Pins the Bench contract line against the REAL query registry: the driver
  * keeps only the tail of the program's output, and round 5's artifact came
  * back unparseable because the line had outgrown that window. Growth is the
  * failure mode (every registered query adds ~30 chars), so the budget is
  * asserted here where adding a query breaks the build, not the round.
  */
class BenchLineSpec extends AnyFunSuite {

  test("headline line fits a tail-truncated capture with the full registry") {
    val results = SparkEntry.queries.keySet.toSeq.sorted
      .map(n => (n, 123.456789, 123.456789))
    val line = Bench.renderHeadline(results, "/root/testdata/sf0.1", 31.99, 31.99)
    // Capture-window reality, re-measured from the r11 artifact: the
    // driver keeps a ~2048-char TAIL of stdout, and sbt's success epilogue
    // (~90 chars) rides after the headline — so the whole line must fit
    // ~1900 chars or the committed artifact's `parsed` comes back null
    // (r11 did: 2.6 KB line, capture started mid-dict). The relief valve
    // is Bench.headlinePruned — the full per-query record is written to
    // BENCH_DETAIL.json regardless, so pruning costs the capture nothing
    // but redundancy. Never nudge this bound upward.
    assert(line.length < 1900,
      s"headline is ${line.length} chars — prune a query from the headline " +
        "(the full numbers are in BENCH_DETAIL.json)")
  }

  test("headline line is one valid JSON object with the contract fields") {
    val results = Seq(("q1_agg", 0.2711119, 0.3222229), ("g1_count", 0.1, 0.1))
    val line = Bench.renderHeadline(results, "/tmp/sf", 2.415, 3.871)
    val node = new ObjectMapper().readTree(line)
    assert(node.get("metric").asText() == "total")
    assert(node.get("unit").asText() == "sec")
    assert(node.get("sf").asText() == "sf") // dir basename
    assert(node.get("load").get(0).asDouble() == 2.4)
    assert(node.get("load").get(1).asDouble() == 3.9)
    assert(node.get("queries").get("q1_agg").asDouble() == 0.27)
    // totals keep 3 decimals (computed from full-precision values)
    assert(math.abs(node.get("value").asDouble() - 0.371) < 1e-9)
    assert(math.abs(node.get("median").asDouble() - 0.422) < 1e-9)
    // per-tier [min_sum, median_sum, n] triples (fmtQ-compact)
    val serving = node.get("tiers").get("serving")
    assert(math.abs(serving.get(0).asDouble() - 0.37) < 1e-9)
    assert(math.abs(serving.get(1).asDouble() - 0.42) < 1e-9)
    assert(serving.get(2).asInt() == 2)
    assert(node.get("tiers").get("pipeline").get(2).asInt() == 0)
  }

  test("every registered query lands in a tier, and the families are stable") {
    val names = SparkEntry.queries.keySet
    names.foreach(n => assert(Set("serving", "etl", "pipeline").contains(Bench.tier(n))))
    assert(Bench.tier("dashboard_refresh_warm") == "serving")
    assert(Bench.tier("search_bm25") == "serving")
    assert(Bench.tier("g7_typeahead") == "serving")
    assert(Bench.tier("dedup_minhash") == "pipeline")
    assert(Bench.tier("pipeline_prep_llm") == "pipeline")
    assert(Bench.tier("ann_ivfpq") == "pipeline")
    // the bare "q" serving prefix must not claim the quality_* family
    assert(Bench.tier("quality_classifier_score") == "pipeline")
    assert(Bench.tier("quality_lm_score") == "pipeline")
    assert(Bench.tier("q8_dict_fetch") == "serving")
    assert(Bench.tier("recipe_harmonize_detroit") == "etl")
    assert(Bench.tier("dict_profile_lineitem") == "etl")
    assert(Bench.tier("stream_sessionize") == "etl")
  }

  test("fmt renders fixed 3-decimal values that are valid JSON numbers") {
    assert(Bench.fmt(0.0761234) == "0.076")
    assert(Bench.fmt(12.3456789) == "12.346")
    assert(Bench.fmt(0.0) == "0.000")
    assert(Bench.fmt(1234.5) == "1234.500")
  }

  test("fmtQ renders compact valid JSON numbers at magnitude-scaled precision") {
    assert(Bench.fmtQ(0.0761234) == "0.08")
    assert(Bench.fmtQ(0.1) == "0.1")
    assert(Bench.fmtQ(1.204) == "1.2")
    assert(Bench.fmtQ(1.47) == "1.5")
    assert(Bench.fmtQ(3.0) == "3")
    assert(Bench.fmtQ(0.0) == "0")
    assert(Bench.fmtQ(12.345) == "12.3")
    assert(Bench.fmtQ(123.456789) == "123")
  }

  test("warmServed covers every _warm query plus the cache-serving fetches") {
    val w = SparkEntry.warmServed
    SparkEntry.queries.keySet.filter(_.endsWith("_warm"))
      .foreach(n => assert(w.contains(n), s"$n missing from warmServed"))
    Seq("dashboard_map_drilldown", "g7_typeahead_federated",
      "q8_dict_fetch_federated").foreach(n =>
      assert(w.contains(n), s"$n missing from warmServed"))
    // Everything in the set must actually be a registered query.
    w.foreach(n => assert(SparkEntry.queries.contains(n),
      s"warmServed names unregistered query $n"))
  }
}
