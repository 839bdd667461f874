package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the training-data pipeline's "remove eval
  * leakage" pass: a corpus document is CONTAMINATED when it shares at least
  * `minHits` distinct word n-grams with any document of a benchmark set
  * (the n-gram-overlap criterion used by the public LLM data pipelines;
  * n ∈ [5, 13] in practice — low n over small vocabularies flags chance
  * overlap, which is the caller's threshold trade-off, not the operator's).
  *
  * Scale shape: the benchmark side is eval sets — thousands of documents
  * against a corpus of billions — so its distinct shingle set is BROADCAST
  * and the corpus never shuffles for the match itself: explode → broadcast
  * hash semi-join → per-doc count with map-side combine. The only corpus
  * shuffle is the per-doc hit count on matching rows (a tiny fraction).
  * Shingles travel as xxhash64 hashes ([[Dedup.shingleHashesNative]]), never
  * strings — identity is all the overlap count needs, the same
  * injective-modulo-2^-64 argument [[Dedup.jaccardPairs]] rests on. For a
  * benchmark set too large to broadcast, drop to the same keyed
  * shuffle-merge join jaccardPairs uses — the semantics don't change.
  */
object Decontamination {

  /** The benchmark's distinct hashed shingle set — compute ONCE per
    * benchmark (it is static for a pipeline's lifetime) and feed the
    * `*Against` variants; a long-running ingest app persists it rather than
    * re-deriving per micro-batch. */
  def benchmarkShingles(bench: DataFrame, benchText: Column, n: Int): DataFrame =
    bench
      .filter(size(TextAnalysis.tokens(benchText)) >= n)
      .select(explode(Dedup.shingleHashesNative(benchText, n)).as("shingle"))
      .distinct()

  /** Distinct-shingle overlap counts per corpus document, contaminated rows
    * only (`hits >= minHits`). Documents shorter than n tokens carry no
    * n-gram and cannot be flagged. */
  def contaminationHits(docs: DataFrame, id: Column, text: Column,
      bench: DataFrame, benchText: Column, n: Int, minHits: Int): DataFrame =
    hitsAgainst(docs, id, text, benchmarkShingles(bench, benchText, n), n, minHits)

  /** [[contaminationHits]] against a precomputed [[benchmarkShingles]] set. */
  def hitsAgainst(docs: DataFrame, id: Column, text: Column,
      benchShingles: DataFrame, n: Int, minHits: Int): DataFrame = {
    val docShingles = docs
      .filter(size(TextAnalysis.tokens(text)) >= n)
      .select(id.as("doc_id"), explode(Dedup.shingleHashesNative(text, n)).as("shingle"))
    // shingleHashesNative is per-doc distinct, so count(*) after the join IS
    // the distinct-overlap count
    docShingles.join(broadcast(benchShingles), "shingle")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("hits"))
      .filter(col("hits") >= minHits)
  }

  /** The corpus with contaminated documents removed — the pass a training
    * run actually consumes. Anti-join on the flagged ids with NO forced
    * broadcast hint (r20 verdict #4, the r12 dropNearDups precedent): the
    * flagged set is contamination-rate-proportional, so on a heavily
    * contaminated corpus with a large benchmark suite it is NOT bounded —
    * AQE sizes the anti-join at runtime and still broadcasts the
    * usual-case small side (pinned in DecontaminationSpec). */
  def clean(docs: DataFrame, id: Column, text: Column,
      bench: DataFrame, benchText: Column, n: Int, minHits: Int): DataFrame = {
    // distinct alias: `docs` carries its own id column, and an unanchored
    // join condition on the shared name would be ambiguous
    val flagged = contaminationHits(docs, id, text, bench, benchText, n, minHits)
      .select(col("doc_id").as("contaminated_id"))
    docs.join(flagged, id === col("contaminated_id"), "left_anti")
  }

  /** The benchmark's distinct WINNOWING fingerprint set
    * ([[Dedup.winnowFingerprints]] over the normalized text) — the fuzzy
    * twin of [[benchmarkShingles]]. */
  def benchmarkFingerprints(bench: DataFrame, benchText: Column,
      k: Int, w: Int): DataFrame =
    bench
      .filter(length(TextAnalysis.normalize(benchText)) >= k)
      .select(explode(
        Dedup.winnowFingerprints(TextAnalysis.normalize(benchText), k, w)).as("f"))
      .distinct()

  /** FUZZY decontamination (r19 verdict #3): flag a corpus document when it
    * shares at least `minHits` winnowing fingerprints with the benchmark
    * set. Exact n-gram decontamination ([[contaminationHits]]) is defeated
    * by the edits benchmark leakage survives in practice — case folding,
    * punctuation splices, token-boundary noise — because every edited
    * word kills the n word-grams through it. Winnowing fingerprints are
    * case-normalized CHARACTER-level features with guaranteed coverage
    * (any unedited run of ≥ k+w−1 chars shares a fingerprint), so an
    * edited copy still accumulates hits from its untouched spans.
    *
    * 100 TB shape: identical to the exact pass — the benchmark fingerprint
    * set broadcasts, the corpus never shuffles for the match, and the only
    * aggregation is the per-doc hit count on matching rows. Fingerprints
    * are per-doc distinct ([[graft.functions.WinnowFingerprintExpr]]
    * dedups), so count(*) after the join IS the distinct-overlap count. No
    * df cut: unlike the pair-join dedups there is no quadratic fan-out to
    * guard — a ubiquitous fingerprint costs one counted row per corpus doc,
    * and dropping it would be a recall hole in a compliance gate. */
  def fuzzyHits(docs: DataFrame, id: Column, text: Column,
      bench: DataFrame, benchText: Column, k: Int, w: Int,
      minHits: Int): DataFrame =
    fuzzyHitsAgainst(docs, id, text,
      benchmarkFingerprints(bench, benchText, k, w), k, w, minHits)

  /** [[fuzzyHits]] against a precomputed [[benchmarkFingerprints]] set. */
  def fuzzyHitsAgainst(docs: DataFrame, id: Column, text: Column,
      benchFps: DataFrame, k: Int, w: Int, minHits: Int): DataFrame = {
    val docFps = docs
      .filter(length(TextAnalysis.normalize(text)) >= k)
      .select(id.as("doc_id"), explode(
        Dedup.winnowFingerprints(TextAnalysis.normalize(text), k, w)).as("f"))
    docFps.join(broadcast(benchFps), "f")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("hits"))
      .filter(col("hits") >= minHits)
  }

  /** The corpus with fuzzily-contaminated documents removed — [[clean]]'s
    * winnowing twin: same un-hinted AQE-sized anti-join (the flagged set is
    * contamination-rate-proportional, not bounded). */
  def fuzzyClean(docs: DataFrame, id: Column, text: Column,
      bench: DataFrame, benchText: Column, k: Int, w: Int,
      minHits: Int): DataFrame = {
    val flagged = fuzzyHits(docs, id, text, bench, benchText, k, w, minHits)
      .select(col("doc_id").as("contaminated_id"))
    docs.join(flagged, id === col("contaminated_id"), "left_anti")
  }
}
