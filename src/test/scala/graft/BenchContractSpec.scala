package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the driver-facing output/registration contracts that round 10 proved
  * can break silently:
  *
  *   - the driver parses ONLY the final stdout line of Bench, captured from a
  *     ~2000-char tail window — if the line is longer than the window, the
  *     window starts mid-line and the driver reads half a JSON object
  *     (BENCH_r10 "parsed": null);
  *   - the driver's correctness gate runs exactly the oracleSql keys — an
  *     oracle entry without a query builder silently contributes nothing, and
  *     a verifyOnly name that drifts from the registry silently un-skips.
  */
class BenchContractSpec extends AnyFunSuite {

  // Headroom under the 2000-char window: the line must fit even when some
  // preceding stderr/stdout noise shares the captured tail.
  private val LineBudget = 1900

  test("worst-case headline line fits the driver's tail window") {
    val benched = SparkEntry.queries.keys.toSeq
      .filterNot(SparkEntry.verifyOnly)
    // worst plausible case: every query at a 4-digit-seconds timing (a
    // 5-digit-seconds query is a dead round, not a formatting problem),
    // including the wall/load env fields at their widest plausible render
    val line = Bench.headline(benched.map(_ -> 9999.99), Nil,
      "/root/testdata/sf0.1", Bench.envJson(99999.999, 128.125))
    assert(line.length <= LineBudget,
      s"headline is ${line.length} chars for ${benched.size} benched queries " +
        s"— over the $LineBudget budget; shorten names or precision")
    // growth headroom (the r12 squeeze): the line is worst-N-bounded, so
    // even 120 benched queries with driver-worst names must leave >=25%
    // slack under the window
    val many = (1 to 120).map(i => f"q_a_long_query_name_$i%03d" -> 9999.99)
    val big = Bench.headline(many, Nil, "/root/testdata/sf0.1")
    assert(big.length <= LineBudget * 3 / 4,
      s"120-query headline is ${big.length} chars — under 25% slack")
    // the all-failed shape: every ERR up to WorstN rides the line, the
    // failed COUNT always does
    val worst = Bench.headline(Nil, benched, "/root/testdata/sf0.1")
    assert(worst.length <= LineBudget * 3 / 4)
    assert(worst.contains(s""""failed":${benched.size}"""))
  }

  test("full map artifact carries every query; tail carries the worst") {
    val ok = (1 to 30).map(i => f"q_n$i%02d" -> i.toDouble)
    val full = Bench.fullMapJson(ok, Seq("q_dead"))
    (1 to 30).foreach(i => assert(full.contains(f""""q_n$i%02d":""")))
    assert(full.contains(""""q_dead":"ERR""""))
    val line = Bench.headline(ok, Seq("q_dead"), "/root/testdata/sf0.1")
    // failures + the (WorstN - failures) slowest make the cut; fast ones don't
    assert(line.contains(""""q_dead":"ERR""""))
    assert(line.contains(""""q_n30":"""))
    assert(line.contains(""""q_n24":""")) // 7th slowest of 30
    assert(!line.contains(""""q_n23":""")) // 8th slot went to the failure
    assert(!line.contains(""""q_n01":"""))
    assert(line.contains(""""n_benched":31"""))
    assert(line.contains(""""detail":"scale/bench_detail_sf0.1.json""""))
  }

  test("headline is a single line of valid shape") {
    val line = Bench.headline(Seq("q_x" -> 1.0), Seq("q_y"), "sf")
    assert(!line.contains("\n"))
    assert(line.startsWith("""{"metric":"total","value":1.00"""))
    assert(line.contains(""""q_y":"ERR""""))
    assert(line.contains(""""failed":1"""))
  }

  test("every oracle key has a query builder") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql keys without builders: $missing")
  }

  test("every verifyOnly name is a registered query") {
    val stale = SparkEntry.verifyOnly -- SparkEntry.queries.keySet
    assert(stale.isEmpty, s"verifyOnly names not in queries: $stale")
  }

  test("every non-verifyOnly query has an oracle or is a documented rows-only twin") {
    // rows-only-by-design: production LSH/sketch paths whose banding DuckDB
    // cannot restate — each has a _det/_all full-oracle twin in verifyOnly
    // q_ann_ivf_kmeans: learned-quantizer IVF — float-mean assignment ties
    // are engine-dependent; objective monotonicity pinned in LlmSpec
    // q_ann_lsh_mp: multi-probe variant of q_ann_lsh — same float-sign
    // sensitivity; recall ⊇ single-probe pinned in LlmSpec, and the
    // family's full-oracle twin (q_ann_lsh_all) covers the shared plumbing
    // q_quality_cut(_by_lang): production approx_percentile thresholds — a
    // GK sketch DuckDB cannot restate; the exact-percentile twins
    // q_quality_cut(_by_lang)_det carry the full-oracle hash and
    // LlmQueriesSpec pins ±5% agreement
    // q_dedup_clusters_lsh / q_dedup_apply_lsh: production MinHash-LSH dedup
    // chain — xxhash64 signatures DuckDB cannot restate; their full-oracle
    // twins q_dedup_clusters_lsh_det / q_dedup_apply_lsh_det (deterministic
    // shingle-id signatures) hash-match, and LlmSpec pins LSH-chain recall
    // against the exact-Jaccard chain
    val rowsOnly = Set("q_dedup_minhash", "q_dedup_simhash", "q_ann_lsh",
      "q_ann_lsh_mp", "q_ann_ivf", "q_ann_ivf_kmeans", "q_quality_cut",
      "q_quality_cut_by_lang", "q_lm_cut_by_lang",
      "q_dedup_clusters_lsh", "q_dedup_apply_lsh")
    val unproven = SparkEntry.queries.keySet --
      SparkEntry.oracleSql.keySet -- rowsOnly
    assert(unproven.isEmpty,
      s"queries with neither an oracle nor a rows-only justification: $unproven")
  }
}
