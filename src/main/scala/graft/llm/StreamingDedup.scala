package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ingest-boundary dedup for a STREAMING documents source — the streaming
  * complement to the batch [[Dedup]] operators, for the pipeline shape where
  * documents arrive continuously (crawl output, log tailing) and exact
  * duplicates should never reach storage at all.
  *
  * Scale design (the part that matters at 100 TB of ingest):
  *
  *   - State is keyed by the 64-bit [[TextAnalysis.fingerprint]], NOT the
  *     text: the state store holds 8-byte keys regardless of document size,
  *     and the fingerprint is computed scan-side (codegen'd xxhash64) before
  *     the stateful exchange, so full texts are never shuffled to the state
  *     operator beyond the surviving row itself.
  *   - `dropDuplicatesWithinWatermark` bounds the state: a fingerprint is
  *     remembered only within the watermark horizon, then evicted. Unbounded
  *     `dropDuplicates` state on an infinite stream is exactly the
  *     grows-forever design a continuous crawl cannot run; the horizon makes
  *     state size ∝ (ingest rate × horizon), independent of stream lifetime.
  *     The trade-off is explicit and tunable: a duplicate arriving AFTER its
  *     original's fingerprint expired is re-admitted, and the downstream
  *     batch [[Dedup.exact]] compaction (which the sink's maintenance tick
  *     already runs) removes those stragglers — the streaming stage is a
  *     high-recall prefilter that keeps the hot path small, not the sole
  *     guarantee of global uniqueness.
  *   - RocksDB state-store compatible (same requirement as
  *     [[graft.streaming.StreamingTemporality]]): at collector-scale
  *     cardinality the fingerprint set outgrows executor heap; the operator
  *     uses only Spark's built-in stateful dedup so the store backend is a
  *     session conf, not a code change.
  */
object StreamingDedup {

  /** Drop exact duplicates (by normalized-text fingerprint) from a streaming
    * documents frame. `docs` must carry `text` and an event-time column
    * `tsCol`; `horizon` is the watermark delay bounding both lateness and
    * dedup-state lifetime. Emits the input columns plus the `fp` fingerprint
    * (downstream compaction joins on it — recomputing it there would repeat
    * the normalize+hash scan work).
    */
  def dedupExact(docs: DataFrame, tsCol: String, horizon: String): DataFrame =
    docs
      .withColumn("fp", TextAnalysis.fingerprint(col("text")))
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark("fp")
}
