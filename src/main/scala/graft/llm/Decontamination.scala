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
    * run actually consumes. Anti-join on the flagged ids: the flagged set is
    * small (it is bounded by benchmark overlap), so the anti-join broadcasts
    * and the corpus still never shuffles. */
  def clean(docs: DataFrame, id: Column, text: Column,
      bench: DataFrame, benchText: Column, n: Int, minHits: Int): DataFrame = {
    // distinct alias: `docs` carries its own id column, and an unanchored
    // join condition on the shared name would be ambiguous
    val flagged = contaminationHits(docs, id, text, bench, benchText, n, minHits)
      .select(col("doc_id").as("contaminated_id"))
    docs.join(broadcast(flagged),
      id === col("contaminated_id"), "left_anti")
  }
}
