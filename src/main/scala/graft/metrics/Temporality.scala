package graft.metrics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch temporality conversion — the semantic heart of the reference pipeline
  * (reference: internal/converter/temporality.go:43-236), re-expressed as
  * Catalyst window expressions instead of a driver-side hash map of per-series
  * state.
  *
  * Shape for 100 TB: one shuffle on the series key (the window partition), then
  * pure per-partition sorted streaming through `lag`/running-sum window exec —
  * no state ever leaves the executors, no driver collects, and AQE can split
  * skewed series-hash ranges. This is the batch twin of the streaming
  * `flatMapGroupsWithState` path (graft.streaming.StreamingTemporality); both
  * share the reset/delta rules below.
  *
  * Semantics (pinned by the reference's own test expectations,
  * test/temporality_test.go:20-123):
  *   - first point of a series passes through unchanged (delta = raw value)
  *     (temporality.go:54-61)
  *   - monotonic sum: reset when value < previous value; on reset delta = raw
  *     value, else delta = value - previous (temporality.go:69-79,158-165)
  *   - non-monotonic sums never reset (temporality.go:160 guards IsMonotonic)
  *   - gauge rows pass through untouched (temporality.go:107-108)
  *
  * Documented divergence: the reference's ResetDetector fails to record the
  * observed value on the FIRST CheckReset call for a series
  * (temporality.go:146-153 returns before writing LastValue), so its detector
  * lags one point behind and its own test sequence [100,150,20,50]→[100,50,20,30]
  * (temporality_test.go:53-95) would actually produce -130 at the third point.
  * We implement the intended, test-pinned semantics: reset iff value < previous
  * point's value.
  *
  * Ordering: results depend on per-series order. The reference assumes arrival
  * order (SURVEY §7.4.1); batch mode makes it explicit — order by (ts, seq)
  * where seq is a deterministic tiebreak column (ingestion sequence).
  */
object Temporality {

  def seriesWindow(partitionCols: Seq[Column], orderCols: Seq[Column]) =
    Window.partitionBy(partitionCols: _*).orderBy(orderCols: _*)

  /** A5 — counter-reset flag for a monotonic-sum value column: true when the
    * previous point exists and the value decreased. */
  def resetFlag(value: Column, w: org.apache.spark.sql.expressions.WindowSpec): Column = {
    val prev = lag(value, 1).over(w)
    prev.isNotNull && value < prev
  }

  /** A4 — cumulative→delta for a scalar sum column.
    * first point → raw; reset → raw; else value - previous. */
  def deltaValue(value: Column, isMonotonic: Column,
      w: org.apache.spark.sql.expressions.WindowSpec): Column = {
    val prev = lag(value, 1).over(w)
    when(prev.isNull, value)
      .when(isMonotonic && value < prev, value)
      .otherwise(value - prev)
  }

  /** A6 — delta→cumulative: running sum per series
    * (reference: temporality.go:207-209). */
  def cumulativeValue(value: Column,
      w: org.apache.spark.sql.expressions.WindowSpec): Column =
    sum(value).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))

  /** A4 histogram path — count/sum are subtracted only when the previous value
    * is > 0 (temporality.go:87-94); on reset the raw snapshot passes through. */
  def deltaGuarded(curr: Column, prev: Column, reset: Column): Column =
    when(prev.isNull || reset, curr)
      .when(prev > 0, curr - prev)
      .otherwise(curr)

  /** J2 — bucket alignment by upper bound: delta per bucket = current count
    * minus the previous snapshot's count *at the same bound*; bounds absent
    * from the previous snapshot pass the current raw count through unchanged
    * (temporality.go:115-140). Bound matching is exact Float64 equality, as in
    * the reference's map key (SURVEY §7.4.3 — no epsilon comparison).
    *
    * `buckets` is array<struct<le:double,count:bigint>>; `prevBuckets` the
    * lagged column of the same type (null on the first point).
    */
  def deltaBuckets(buckets: Column, prevBuckets: Column, reset: Column): Column =
    // Native codegen delta (graft.functions.BucketDeltaExpr): bucket
    // alignment runs per histogram data point — full-scan row volume — and
    // the HOF form below is O(bounds²) interpreted lambda evals per row.
    // Pinned bit-identical (incl. last-wins duplicate bounds) by
    // BucketDeltaExprSpec.
    when(prevBuckets.isNull || reset, buckets)
      .otherwise(graft.functions.BucketDeltaExpr.delta(buckets, prevBuckets))

  /** Readable HOF reference shape of [[deltaBuckets]].
    * Lookup by filter + last element rather than map_from_entries: duplicate
    * `le` bounds in a snapshot would make map_from_entries throw, while the
    * reference's Go map insert is silently last-wins — try_element_at(…, -1)
    * reproduces exactly that. */
  def deltaBucketsHof(buckets: Column, prevBuckets: Column, reset: Column): Column = {
    def prevCount(le: Column): Column =
      coalesce(
        try_element_at(filter(prevBuckets, p => p.getField("le") === le), lit(-1))
          .getField("count"),
        lit(0L))
    when(prevBuckets.isNull || reset, buckets)
      .otherwise(transform(buckets, b =>
        struct(
          b.getField("le").as("le"),
          (b.getField("count") - prevCount(b.getField("le"))).as("count"))))
  }

  /** Convenience: annotate a gauge/sum DataFrame with `is_reset` and `delta`
    * columns keyed by `seriesCols`, ordered by `orderCols`. */
  def toDelta(df: DataFrame, seriesCols: Seq[Column], orderCols: Seq[Column],
      value: Column = col("value"), isMonotonic: Column = lit(true)): DataFrame = {
    val w = seriesWindow(seriesCols, orderCols)
    df.withColumn("is_reset", coalesce(resetFlag(value, w) && isMonotonic, lit(false)))
      .withColumn("delta", deltaValue(value, isMonotonic, w))
  }

  /** Convenience: annotate with the running cumulative reconstruction.
    * The reference's promread path runs this with a shared accumulator across
    * all series (handler.go:184-197 never sets SeriesHash ⇒ key 0) — a
    * documented bug we diverge from by keying per series. */
  def toCumulative(df: DataFrame, seriesCols: Seq[Column], orderCols: Seq[Column],
      value: Column = col("value")): DataFrame = {
    val w = seriesWindow(seriesCols, orderCols)
    df.withColumn("cum_value", cumulativeValue(value, w))
  }
}
