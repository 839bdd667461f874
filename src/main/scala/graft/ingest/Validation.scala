package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** P1–P3 — metric validation + stamping (reference:
  * internal/processor/processor.go:120-172, :62, :98).
  *
  * The reference's validateMetric returns the FIRST failing rule as an error
  * and drops the row (processor.go:66-70). Relationally we compute a
  * `reject_reason` column with the same first-match-wins ordering, then split
  * valid rows from the dead-letter side with two filters over one scan —
  * Catalyst reuses the predicate subtree, and at 100 TB both branches stream
  * from the same exchange-free projection.
  *
  * "now" is a parameter, not `current_timestamp()`: the reference's rules are
  * wall-clock-relative (processor.go:129-134); a pinned `nowMs` makes batch
  * runs reproducible and lets tests and oracle SQL agree bit-for-bit.
  */
object Validation {

  val ReasonEmptyName = "empty_name"
  val ReasonZeroTs = "zero_ts"
  val ReasonTooFuture = "too_future"
  val ReasonTooOld = "too_old"
  val ReasonMissingValue = "missing_value"
  val ReasonMissingHistogram = "missing_histogram_data"
  val ReasonMissingSummary = "missing_summary_data"
  val ReasonUnknownType = "unknown_type"
  val Valid = "valid"

  val DayMs: Long = 24L * 3600 * 1000

  /** First-match-wins reject reason; "valid" when every rule passes.
    * Rule order mirrors processor.go:121-168 exactly:
    * empty name → zero ts → too future (> now+24h) → too old (< now-7d) →
    * per-type required fields → unknown type.
    *
    * `metricType` ∈ {gauge,sum,histogram,summary} (metric.go:7-16); any other
    * string is the unknown-type reject (processor.go:166-168).
    */
  def rejectReason(
      metricName: Column, tsMs: Column, metricType: Column,
      value: Column, count: Column, sum: Column, buckets: Column,
      nowMs: Long): Column =
    rejectReason(metricName, tsMs, metricType, value, count, sum, buckets,
      lit(nowMs))

  /** Column-`now` overload: a long-running stream passes
    * `unix_millis(current_timestamp())`, which Structured Streaming pins to
    * each micro-batch's time — the per-metric `time.Now()` of
    * processor.go:129-134. A frozen launch-time literal would start
    * rejecting ALL fresh data as too_future after 24h of uptime. */
  def rejectReason(
      metricName: Column, tsMs: Column, metricType: Column,
      value: Column, count: Column, sum: Column, buckets: Column,
      nowMs: Column): Column =
    when(metricName.isNull || metricName === "", lit(ReasonEmptyName))
      .when(tsMs.isNull || tsMs === 0L, lit(ReasonZeroTs))
      .when(tsMs > nowMs + lit(DayMs), lit(ReasonTooFuture))
      .when(tsMs < nowMs - lit(7 * DayMs), lit(ReasonTooOld))
      .when(metricType.isin("gauge", "sum") && value.isNull, lit(ReasonMissingValue))
      .when(metricType === "histogram" && count.isNull && sum.isNull &&
        (buckets.isNull || size(buckets) === 0), lit(ReasonMissingHistogram))
      .when(metricType === "summary" && (count.isNull || sum.isNull),
        lit(ReasonMissingSummary))
      // null-safe: a NULL metricType must reject like the reference's switch
      // default (every isin/=== above yields NULL and is skipped, so without
      // the isNull arm a NULL type would fall through to "valid")
      .when(metricType.isNull || !metricType.isin("gauge", "sum", "histogram", "summary"),
        lit(ReasonUnknownType))
      .otherwise(lit(Valid))

  /** P2 — workspace stamping: overwrite workspace on every row
    * (processor.go:62). */
  def stampWorkspace(df: DataFrame, workspaceId: String): DataFrame =
    df.withColumn("workspace_id", lit(workspaceId))

  /** P3 — TTL stamping: now + 3h, as ms-epoch (processor.go:98;
    * schema.sql:63). */
  def stampTtl(df: DataFrame, tsNowMs: Column): DataFrame =
    df.withColumn("ttl_ms", tsNowMs + lit(3L * 3600 * 1000))

  /** S4 — exemplar cap: keep the first `max` exemplars, or none when disabled
    * (processor.go:100-104; otlp.go:298-330). Both branches return the FULL
    * exemplar struct ([[graft.model.Schemas.exemplarType]]) so the operator's
    * type does not depend on the flag. */
  def capExemplars(exemplars: Column, enabled: Boolean, max: Int = 10): Column =
    if (!enabled)
      lit(null).cast(org.apache.spark.sql.types.ArrayType(graft.model.Schemas.exemplarType))
    else slice(exemplars, 1, max)

  /** Split into (valid, deadLetter) on a precomputed reject_reason column. */
  def split(df: DataFrame): (DataFrame, DataFrame) =
    (df.filter(col("reject_reason") === Valid),
      df.filter(col("reject_reason") =!= Valid))
}
