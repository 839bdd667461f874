package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact substring (span-level) duplication — Lee et al. 2022's signal
  * restated over w-token windows: a window is DUPLICATED when the same
  * w-token run appears in at least one OTHER document ([[Dedup]]'s
  * document-level passes can't see a copied paragraph inside otherwise
  * distinct docs, and [[TextAnalysis.dupLineFrac]] only sees repeats
  * within ONE doc). The per-doc report (window count, cross-doc duplicated
  * window count, duplicated fraction) is the curation signal: a high
  * dup_frac doc is mostly boilerplate someone else already contributes.
  *
  * 100 TB shape: windows explode to (hash, doc) — |tokens| rows keyed by
  * hash, the inverted-index class the shingle/winnow passes already use;
  * the per-hash doc-count needs DISTINCT docs, so it aggregates in two
  * map-side-combined stages (groupBy(hash, doc) then groupBy(hash)); the
  * flagged-hash set joins back to the window table on the hash key. No
  * all-pairs stage, no per-key state beyond counts. The window hash is
  * the engine-portable poly hash ([[graft.functions.TokenWindowHashesExpr]])
  * so the oracle restates the WHOLE pipeline — full hash-match, no twin. */
object SpanDedup {

  /** Window width in tokens. Lee et al. use 50-token spans; 8 keeps the
    * fixtures' 12-token planted paragraphs detectable while exercising the
    * identical plan — a production caller raises it without changing the
    * shape. */
  val W = 8

  /** Per-doc span-duplication report: (id, n_windows, n_dup, dup_frac).
    *
    * Two corpus passes, the derive-then-flag shape (q_quality_cut's
    * doctrine): pass 1 derives the cross-doc shared-hash set (distinct
    * (doc, h) then ≥2-docs filter — vocabulary-grain output); pass 2
    * re-aggregates (doc, h) occurrence counts, broadcast-flags each hash
    * against the shared set, and folds BOTH report sums in ONE
    * conditional aggregation per doc — no third pass, no outer-join
    * null-filter asymmetry to defeat exchange reuse. */
  def report(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val wins = docs.select(id.as("doc_id"),
        explode(graft.functions.TokenWindowHashesExpr.hashes(
          TextAnalysis.flatTokens(text), W)).as("h"))
    // hashes seen in >= 2 distinct docs (the (doc, h) distinct collapses
    // first, so the count is exact and map-side combined)
    val shared = wins.distinct()
      .groupBy(col("h"))
      .agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= 2)
      .select(col("h"), lit(true).as("dup"))
    wins.groupBy(col("doc_id"), col("h"))
      .agg(count(lit(1)).as("n_occ"))
      // un-hinted: AQE sizes the shared set at runtime (a crawl-scale
      // corpus can carry a broadcast-hostile number of shared spans —
      // the dedup-apply r11 lesson)
      .join(shared, Seq("h"), "left")
      .groupBy(col("doc_id"))
      .agg(sum(col("n_occ")).as("n_windows"),
        sum(when(col("dup"), col("n_occ")).otherwise(0L)).as("n_dup"))
      .select(col("doc_id"), col("n_windows"), col("n_dup"),
        round(col("n_dup").cast("double") / col("n_windows"), 6)
          .as("dup_frac"))
  }
}
