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
  * so the oracle restates the WHOLE pipeline — full hash-match, no twin.
  *
  * Collision guard: every stage keys on the PAIR (h, h2) — the 31-bit
  * oracle hash plus an independent 41-bit hash (different base AND
  * modulus). A 31-bit hash alone collides past ~55k distinct windows
  * (birthday bound), and a false window match CUTS REAL TEXT from an
  * innocent document; the pair pushes the first expected collision past
  * ~2³⁶ windows. Both hashes are plain 64-bit folds DuckDB restates, so
  * the oracle still covers the exact production semantics. */
object SpanDedup {

  /** Window width in tokens. Lee et al. use 50-token spans; 8 keeps the
    * fixtures' 12-token planted paragraphs detectable while exercising the
    * identical plan — a production caller raises it without changing the
    * shape. */
  val W = 8

  /** Substring-dedup APPLY (Lee et al. 2022's text surgery): every
    * duplicated w-token window — ANY window whose hash occurs twice
    * anywhere in the corpus, within one doc or across docs — keeps only
    * its GLOBAL first occurrence (lowest (doc, start)); every other
    * occurrence's tokens are cut from their document. Output per doc:
    * token counts and the cleaned text (kept tokens rejoined).
    *
    * Contract details (shared with the oracle): window starts and token
    * positions are 1-based; a token is cut when ANY flagged window covers
    * it (coverage union of [s, s+w−1] ranges); docs under w tokens carry
    * no windows and pass through intact.
    *
    * 100 TB shape: the same inverted-index explode as [[report]]; the
    * owner per hash is one map-side-combined min-struct aggregate; flagged
    * (doc, start) lists fold back per doc (bounded by the doc's own window
    * count) and the cut is a per-row coverage filter — no text ever joins
    * against text.
    *
    * Measured 10× scaling term (r20 re-measurement, quiet machine — the
    * r19 scaladoc's 2.7× was a stale/loaded reading; the close gate's
    * 4.5× is real for the bench's min-of-3 protocol): WARM steady-state
    * (second `Scratch span_ab` iteration) registered query 2.48→7.08 s
    * (2.9×), apply chain 1.74→5.69 s (3.3×), of which owners agg
    * 0.91→1.81 s (2.0×, linear) and the flagged join + per-doc collect
    * 1.66→4.93 s (3.0×) — the bench's 4.5× adds first-run scan/codegen
    * init that min-of-3 does not amortize at 10x partition counts. The
    * join+collect stage is the above-linear term and it is DATA-driven,
    * not plan-driven: the replica corpus is ~90% duplicated, so the
    * flagged fraction rises from ~0.1 to ~1.0 of all windows and every
    * flagged occurrence must flow to its document to be cut — the work IS
    * the output (formally registered in scale/run_close_gate.sh's tail
    * register). A per-hash df cap would not shrink it here (replica
    * hashes sit at df≈10, far under any boilerplate threshold), and
    * fusing the owner aggregate into a per-hash collect_list would
    * re-introduce the hot-hash straggler the two-aggregate shape exists
    * to avoid. */
  def dedupApply(docs: DataFrame, id: Column, text: Column): DataFrame = {
    // PERSISTED (r21): the window extraction (tokenize + two poly hashes +
    // posexplode — the corpus-token-scale pass) feeds the owner aggregate
    // AND the flagged join, and exchange reuse does not deduplicate them
    // (measured: 6 physical fixture scans = the extraction executing
    // twice plus the text pass). Cached rows are (doc_id, s, h, h2) longs.
    // RELEASE OBLIGATION (r21 ADVICE): not unpersisted here — CALLERS must
    // release via graft.CacheHygiene.releaseAll after materializing
    // (Verify/Bench/the query harness do); direct library use in a
    // long-lived session otherwise accumulates the cached relation.
    val wins = windows(docs, id, text)
      .select(col("doc_id"), col("s"), col("h"), col("h2"))
      .persist()
    val owners = wins.groupBy(col("h"), col("h2"))
      .agg(min(struct(col("doc_id"), col("s"))).as("own"),
        count(lit(1)).as("n_occ"))
      .filter(col("n_occ") >= 2)
      .select(col("h"), col("h2"),
        col("own.doc_id").as("own_doc"), col("own.s").as("own_s"))
    val flagged = wins.join(owners, Seq("h", "h2"))
      .filter(!(col("doc_id") === col("own_doc") && col("s") === col("own_s")))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("s"))).as("cuts"))
    docs.select(id.as("doc_id"), text.as("__text"))
      .join(flagged, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cuts"), array().cast("array<long>")).as("cuts"),
        TextAnalysis.flatTokens(col("__text")).as("t"))
      .select(col("doc_id"),
        size(col("t")).cast("long").as("n_tokens"),
        filter(col("t"), (_, i) =>
          !exists(col("cuts"), s => s <= i + 1 && i + 1 < s + W)).as("kept"))
      .select(col("doc_id"), col("n_tokens"),
        size(col("kept")).cast("long").as("n_kept"),
        concat_ws(" ", col("kept")).as("kept_text"))
  }

  /** Dev probes for the Scratch `span_ab` stage decomposition — the apply
    * chain truncated before (probeOwners) and after (probeCuts) the flagged
    * join, so the superlinear stage can be named from timings. */
  private[graft] def probeOwners(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val wins = windows(docs, id, text)
      .select(col("doc_id"), col("s"), col("h"), col("h2"))
    wins.groupBy(col("h"), col("h2"))
      .agg(min(struct(col("doc_id"), col("s"))).as("own"),
        count(lit(1)).as("n_occ"))
      .filter(col("n_occ") >= 2)
      .select(col("h"), col("h2"),
        col("own.doc_id").as("own_doc"), col("own.s").as("own_s"))
  }

  private[graft] def probeCuts(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val wins = windows(docs, id, text)
      .select(col("doc_id"), col("s"), col("h"), col("h2"))
    val owners = wins.groupBy(col("h"), col("h2"))
      .agg(min(struct(col("doc_id"), col("s"))).as("own"),
        count(lit(1)).as("n_occ"))
      .filter(col("n_occ") >= 2)
      .select(col("h"), col("h2"),
        col("own.doc_id").as("own_doc"), col("own.s").as("own_s"))
    wins.join(owners, Seq("h", "h2"))
      .filter(!(col("doc_id") === col("own_doc") && col("s") === col("own_s")))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("s"))).as("cuts"))
  }

  /** Shared window extraction: (doc_id, s, h, h2) per w-token window,
    * both hashes off ONE token-array pass (tokens materialize once). */
  private def windows(docs: DataFrame, id: Column, text: Column): DataFrame =
    docs.select(id.as("doc_id"), TextAnalysis.flatTokens(text).as("t"))
      .select(col("doc_id"),
        posexplode(arrays_zip(
          graft.functions.TokenWindowHashesExpr.hashes(col("t"), W).as("h"),
          graft.functions.TokenWindowHashesExpr.hashes2(col("t"), W).as("h2")))
          .as(Seq("p0", "hz")))
      .select(col("doc_id"), (col("p0") + 1).cast("long").as("s"),
        col("hz.h").as("h"), col("hz.h2").as("h2"))

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
    val wins = windows(docs, id, text)
      .select(col("doc_id"), col("h"), col("h2"))
    // ONE token-scale aggregation (r21): the old shape ran the window
    // extraction twice and shuffled the full window table twice — once for
    // a distinct() feeding the shared-hash set and once for the per-doc
    // occurrence counts. Both derive from the SAME (doc, h, h2) aggregate:
    // its rows are distinct by construction, so the cross-doc count is a
    // second, already-reduced aggregation over it. occ is deliberately NOT
    // persisted (it feeds the shared-set branch and the flag join, but the
    // r21 A/B measured the cache fill+scan costing more than recomputing
    // the already-reduced aggregate — 1.70 s cached vs 1.19-1.24 s
    // recomputed at sf0.1; PlanScanBudgetSpec pins the same rationale).
    val occ = wins.groupBy(col("doc_id"), col("h"), col("h2"))
      .agg(count(lit(1)).as("n_occ"))
    val shared = occ
      .groupBy(col("h"), col("h2"))
      .agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= 2)
      .select(col("h"), col("h2"), lit(true).as("dup"))
    // un-hinted: AQE sizes the shared set at runtime (a crawl-scale
    // corpus can carry a broadcast-hostile number of shared spans —
    // the dedup-apply r11 lesson)
    occ.join(shared, Seq("h", "h2"), "left")
      .groupBy(col("doc_id"))
      .agg(sum(col("n_occ")).as("n_windows"),
        sum(when(col("dup"), col("n_occ")).otherwise(0L)).as("n_dup"))
      .select(col("doc_id"), col("n_windows"), col("n_dup"),
        round(col("n_dup").cast("double") / col("n_windows"), 6)
          .as("dup_frac"))
  }
}
