package graft.metrics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables

/** Canonical metrics view derived deterministically from the driver's `events`
  * table, so every metrics-pipeline operator (temporality conversion, rollups,
  * promread) can be exercised against the DuckDB oracle on shared data.
  *
  * The mapping is pure column arithmetic — identical SQL exists on the oracle
  * side (see [[graft.queries.OracleDefs.EvtCte]]):
  *   - workspace_id  = 'ws-'  || user_id % 4       (tenant, reference metric.go:27)
  *   - metric        = 'evt_' || event_type        (metric name, metric.go:29)
  *   - service_name  = 'svc-' || user_id % 3       (metric.go:30)
  *   - ts_ms         = epoch millis of ts          (ms-epoch I/O convention of the
  *                                                  read path, handler.go:236-240)
  *   - value         = value                       (gauge/sum value, metric.go:35)
  *
  * A series is (workspace_id, metric, user_id) — mirroring the reference's
  * series identity = name + workspace + attributes (writer.go:105-116), where
  * here the attribute set is {user: user_id, kind: event_type}.
  *
  * Scale note: this is a pure narrow projection over the parquet scan — no
  * shuffle, fully codegen'd, columns pruned at the reader. At 100 TB the same
  * view is simply a wider scan; everything downstream partitions on the series
  * key it declares here.
  */
object EventsMetrics {

  /** Millisecond epoch of the event timestamp. Tables.events normalizes every
    * testdata encoding (ns-as-long, TIMESTAMP_NTZ, TIMESTAMP) to a µs
    * TimestampType, and µs→ms floors identically from any of them, so this
    * column is engine-stable. The defensive cast keeps this total even on a
    * raw NTZ column that bypassed Tables.events (unix_millis rejects NTZ;
    * the session is UTC-pinned so the cast is value-preserving). */
  def tsMs(ts: Column): Column =
    unix_millis(ts.cast(org.apache.spark.sql.types.TimestampType))

  def fromEvents(spark: SparkSession, sfDir: String): DataFrame =
    fromEventsDf(Tables.events(spark, sfDir))

  def fromEventsDf(events: DataFrame): DataFrame =
    events.select(
      col("event_id"),
      tsMs(col("ts")).as("ts_ms"),
      concat(lit("ws-"), (col("user_id") % 4).cast("string")).as("workspace_id"),
      concat(lit("evt_"), col("event_type")).as("metric"),
      concat(lit("svc-"), (col("user_id") % 3).cast("string")).as("service_name"),
      col("user_id"),
      col("event_type"),
      col("value"),
      col("props"))

  /** Attribute map for the canonical view — arbitrary label keys land in a
    * MapType column exactly like the reference's `attributes Map(String,String)`
    * (schema.sql:52). */
  def withAttributes(df: DataFrame): DataFrame =
    df.withColumn(
      "attributes",
      map(
        lit("kind"), col("event_type"),
        lit("svc"), col("service_name"),
        lit("user"), col("user_id").cast("string")))

  /** Deterministic histogram-typed extension of the canonical view: every row
    * gains the FULL OTLP datapoint payload — count/sum + explicit buckets
    * (schema.sql:146-192's 1m MV inputs), exp-histogram fields
    * (schema.sql:172-178), and an attribute map — as pure column arithmetic
    * over (user_id, metric, value). Every payload reduces to closed-form
    * scalars, so full-width rollup and read-path operators stay
    * oracle-checkable: DuckDB restates each aggregate as modular sums.
    * exp_zero_threshold is a per-metric exact binary fraction so `any()`
    * over a (workspace, metric) group is deterministic. */
  def withHistogram(df: DataFrame): DataFrame = {
    val u = col("user_id")
    df.select(
      col("workspace_id"), col("metric"), col("ts_ms"), col("event_id"),
      col("value"),
      (u % 10 + 1).cast("long").as("count"),
      round(col("value") * 10, 2).as("sum"),
      array(
        struct(lit(0.1).as("le"), (u % 3).cast("long").as("count")),
        struct(lit(1.0).as("le"), (u % 5).cast("long").as("count")),
        struct(lit(10.0).as("le"), (u % 7).cast("long").as("count")),
        struct(lit(Double.PositiveInfinity).as("le"),
          (u % 11).cast("long").as("count"))).as("buckets"),
      (length(col("metric")) % 3).as("exp_scale"),
      (u % 4).cast("long").as("exp_zero_count"),
      ((length(col("metric")) % 3) * 0.5).as("exp_zero_threshold"),
      array(struct(lit(1).as("index"), (u % 5).cast("long").as("count")))
        .as("exp_positive_buckets"),
      array(struct(lit(-1).as("index"), (u % 6).cast("long").as("count")))
        .as("exp_negative_buckets"),
      map(lit("m"), col("metric")).as("attributes"))
  }

  /** Series identity hash — F9 (reference writer.go:105-116) with the
    * SURVEY-documented determinism fix: the reference iterates a Go map whose
    * key order is random, making the hash nondeterministic run-to-run
    * (writer.go:110-113); we sort attribute entries before hashing so the same
    * logical series always hashes identically. Bit-compat with Go's xxhash is
    * not required (the hash is internal identity only); determinism is.
    */
  def seriesHash(metricName: Column, workspaceId: Column, attributes: Column): Column =
    // the sorted-entry rendering is the native LabelsKeyExpr (bit-identical
    // to the HOF shape — same hash values), so the per-datapoint hot path
    // pays one compiled helper call instead of four interpreted ops
    xxhash64(
      metricName,
      workspaceId,
      graft.functions.LabelsKeyExpr.labelsKey(attributes))

  def withSeriesHash(df: DataFrame): DataFrame =
    df.withColumn(
      "series_hash",
      seriesHash(col("metric"), col("workspace_id"), col("attributes")))

  /** Full canonical view: metrics columns + attributes + series hash. */
  def canonical(spark: SparkSession, sfDir: String): DataFrame =
    withSeriesHash(withAttributes(fromEvents(spark, sfDir)))
}
