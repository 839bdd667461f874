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

  /** Millisecond epoch of the event timestamp. `events.ts` arrives at
    * nanosecond precision; Spark truncates to µs on read (Tables.events) and
    * both µs→ms and ns→ms floor identically, so this column is engine-stable. */
  def tsMs(ts: Column): Column = unix_millis(ts)

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
