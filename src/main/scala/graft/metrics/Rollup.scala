package graft.metrics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rollup cascade A1–A3 — the Spark re-expression of the reference's
  * ClickHouse materialized views (reference: internal/clickhouse/schema.sql
  * :146-192 for 1m, :249-283 for 5m, :340-374 for 1h).
  *
  * Shapes reproduced faithfully:
  *   - tier N+1 reads tier N, not raw (schema.sql:249 reads metrics_1m,
  *     :340 reads metrics_5m) — so 5m/1h averages are averages OF averages,
  *     NOT sample-weighted averages (schema.sql:262). Mathematically wrong,
  *     semantically the reference; pinned by RollupSpec so nobody "fixes" it.
  *   - value_last is `anyLast(value)` per bucket (schema.sql:161) — the last
  *     value in per-series order. We make the order explicit and deterministic
  *     with `max_by(value, seq)` where seq is the ingestion sequence.
  *   - samples_count counts raw rows at 1m (schema.sql:190 count()) and SUMS
  *     at coarser tiers (schema.sql:281 sum(samples_count)).
  *
  * Scale: each tier is a single hash aggregation — partial map-side combine,
  * one shuffle on (series keys, bucket). The cascade re-aggregates the
  * already-small previous tier, so 5m/1h cost is negligible next to 1m. At
  * 100 TB the 1m shuffle is the dominant cost and is unavoidable (it IS the
  * groupBy); AQE coalesces the post-shuffle partitions.
  *
  * Time buckets are BIGINT ms-epoch floors ((ts_ms div grain) * grain) rather
  * than timestamps: engine-portable (identical arithmetic in DuckDB), tz-free,
  * and exactly ClickHouse's toStartOfMinute/FiveMinute/Hour semantics
  * (schema.sql:152,255,346).
  */
object Rollup {

  /** Integer-exact floor: ts - (ts mod grain). Avoids the double-division
    * rounding hazard of `cast(ts/grain as long)` at bucket boundaries. */
  def bucketMs(tsMs: Column, grainMs: Long): Column =
    tsMs.cast("long") - pmod(tsMs.cast("long"), lit(grainMs))

  /** A1 — 1m rollup over raw points. `seq` orders anyLast within the bucket. */
  def rollup1m(raw: DataFrame, seriesCols: Seq[Column], tsMs: Column,
      value: Column, seq: Column): DataFrame =
    raw.groupBy(seriesCols :+ bucketMs(tsMs, 60000L).as("bucket_ms"): _*)
      .agg(
        min(value).as("value_min"),
        max(value).as("value_max"),
        avg(value).as("value_avg"),
        max_by(value, seq).as("value_last"),
        sum(value).as("value_sum"),
        count(lit(1)).as("samples_count"),
        max(seq).as("last_seq"))

  /** A2/A3 — re-aggregate a finer tier into `grainMs` buckets, faithful
    * avg-of-avgs included (schema.sql:262,353). */
  def rollupCoarser(finer: DataFrame, seriesCols: Seq[Column], grainMs: Long): DataFrame =
    finer.groupBy(seriesCols :+ bucketMs(col("bucket_ms"), grainMs).as("bucket_ms"): _*)
      .agg(
        min(col("value_min")).as("value_min"),
        max(col("value_max")).as("value_max"),
        avg(col("value_avg")).as("value_avg"),
        max_by(col("value_last"), col("last_seq")).as("value_last"),
        sum(col("value_sum")).as("value_sum"),
        sum(col("samples_count")).as("samples_count"),
        max(col("last_seq")).as("last_seq"))

  def rollup5m(oneMinute: DataFrame, seriesCols: Seq[Column]): DataFrame =
    rollupCoarser(oneMinute, seriesCols, 300000L)

  def rollup1h(fiveMinute: DataFrame, seriesCols: Seq[Column]): DataFrame =
    rollupCoarser(fiveMinute, seriesCols, 3600000L)

  /** A1 with the FULL 1m MV column set (schema.sql:146-192): scalar stats
    * plus `sum(count)/sum(sum)`, the histogram-bucket concatenation
    * (ClickHouse `groupArray(buckets.le/count)` collects every snapshot of
    * the minute — reproduced as `flatten(collect_list(buckets))`, keeping
    * (le,count) struct pairs instead of parallel arrays), exp-histogram
    * fields (`any(exp_scale)`/`any(exp_zero_threshold)` → `any_value`;
    * `sum(exp_zero_count)`; positive AND negative bucket concats,
    * schema.sql:172-178), and `any(attributes)`. The reference does NOT sum bucket counts by bound at
    * rollup time — readers merge on demand (HistogramMath.mergeBuckets);
    * faithfully mirrored.
    *
    * Scale note: identical single hash-agg shape as [[rollup1m]]; the bucket
    * concat makes rows wider, not the shuffle deeper — collect_list here is
    * bounded by samples/minute/series, not by table size. */
  /** A2/A3 full-width — re-aggregate a FULL finer tier into `grainMs` buckets
    * with the complete 5m/1h MV column set (schema.sql:249-283 for 5m,
    * :340-374 for 1h): scalar stats (avg-of-avgs faithful, schema.sql:262,353),
    * `sum(count)`/`sum(sum)`, the `groupArray(buckets.le/count)` concat
    * (schema.sql:265-267,356-358 — reproduced as `flatten(collect_list)`,
    * same (le,count)-struct representation as [[rollup1mFull]]), and
    * `any(attributes)` (schema.sql:269,360).
    *
    * Exp-histogram fields are deliberately ABSENT: the reference's 5m/1h
    * TABLES carry no exp columns (schema.sql:194-247,285-336 declare only
    * `buckets Nested(le,count)` + `attributes`), so those fields exist at the
    * 1m grain only — faithfully mirrored, input exp columns are dropped.
    *
    * Scale: one hash agg per tier over the already-small finer tier. The
    * bucket concat grows per-ROW width (entries/row = bounds × snapshots in
    * the coarse bucket — bounded by the series' scrape rate, never by table
    * size; the reference stores the identical concat and merges at read). */
  /** The tier's stored bucket vector: the reference-faithful per-snapshot
    * concat by default (`groupArray` — entries grow with raw DENSITY), or,
    * when `merged` is set, the bound-summed vector via
    * [[graft.functions.MergeBucketsAgg]] (entries bounded by the series'
    * DISTINCT bounds, independent of samples per bucket).
    *
    * The merged form is an OPT-IN divergence from the reference MV schema
    * (schema.sql:265-267 stores the concat) that every reader tolerates
    * unchanged: all engine read paths — the stored-read queries, promread,
    * and the [[graft.plans.RollupRouting]] histogram rewrite — merge the
    * stored vector with `merge_buckets_agg` before any quantile, and merging
    * an already-merged vector is the identity on the bound→count multiset
    * (merge is associative+commutative and quantiles are split-invariant:
    * property-pinned in HistogramMathPropSpec). What changes is SCALE:
    * tier BYTES stop growing with raw density, which makes routed histogram
    * dashboards density-independent like their scalar twins (SCALE.md
    * round-10 density sweep measured the concat's growth). */
  private def storedBuckets(buckets: Column, merged: Boolean): Column =
    if (merged) graft.functions.MergeBucketsAgg.merge(buckets)
    else flatten(collect_list(buckets))

  def rollupCoarserFull(finer: DataFrame, seriesCols: Seq[Column],
      grainMs: Long, mergeTierBuckets: Boolean = false): DataFrame =
    finer.groupBy(seriesCols :+ bucketMs(col("bucket_ms"), grainMs).as("bucket_ms"): _*)
      .agg(
        min(col("value_min")).as("value_min"),
        max(col("value_max")).as("value_max"),
        avg(col("value_avg")).as("value_avg"),
        max_by(col("value_last"), col("last_seq")).as("value_last"),
        sum(col("count")).as("count"),
        sum(col("sum")).as("sum"),
        storedBuckets(col("buckets"), mergeTierBuckets).as("buckets"),
        any_value(col("attributes"), lit(true)).as("attributes"),
        sum(col("samples_count")).as("samples_count"),
        max(col("last_seq")).as("last_seq"))

  def rollup5mFull(oneMinute: DataFrame, seriesCols: Seq[Column],
      mergeTierBuckets: Boolean = false): DataFrame =
    rollupCoarserFull(oneMinute, seriesCols, 300000L, mergeTierBuckets)

  def rollup1hFull(fiveMinute: DataFrame, seriesCols: Seq[Column],
      mergeTierBuckets: Boolean = false): DataFrame =
    rollupCoarserFull(fiveMinute, seriesCols, 3600000L, mergeTierBuckets)

  def rollup1mFull(raw: DataFrame, seriesCols: Seq[Column], tsMs: Column,
      seq: Column, mergeTierBuckets: Boolean = false): DataFrame =
    raw.groupBy(seriesCols :+ bucketMs(tsMs, 60000L).as("bucket_ms"): _*)
      .agg(
        min(col("value")).as("value_min"),
        max(col("value")).as("value_max"),
        avg(col("value")).as("value_avg"),
        max_by(col("value"), seq).as("value_last"),
        sum(col("count")).as("count"),
        sum(col("sum")).as("sum"),
        storedBuckets(col("buckets"), mergeTierBuckets).as("buckets"),
        any_value(col("exp_scale"), lit(true)).as("exp_scale"),
        sum(col("exp_zero_count")).as("exp_zero_count"),
        any_value(col("exp_zero_threshold"), lit(true)).as("exp_zero_threshold"),
        flatten(collect_list(col("exp_positive_buckets"))).as("exp_positive_buckets"),
        flatten(collect_list(col("exp_negative_buckets"))).as("exp_negative_buckets"),
        any_value(col("attributes"), lit(true)).as("attributes"),
        count(lit(1)).as("samples_count"),
        max(seq).as("last_seq"))
}
