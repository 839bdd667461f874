package graft.sink

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.metrics.{EventsMetrics, Rollup}

/** ST8 — incremental MV cascade: freshness-window equivalence with the batch
  * cascade, idempotence, and pre-window preservation inside monthly
  * partitions (reference: schema.sql:183,274,365 MV freshness filters). */
class RollupMaintenanceSpec extends SparkSpec {

  private val keys = Seq(col("workspace_id"), col("metric"))

  private def raw() =
    EventsMetrics.withHistogram(EventsMetrics.fromEvents(spark, Sf))

  private def freshBase(): String = {
    val base = Files.createTempDirectory("graft_maint_spec").toString
    MetricsSink.write(raw(), base,
      MetricsSink.Raw, col("ts_ms"), keys, mode = "overwrite")
    base
  }

  private def h1Rows(base: String): Array[String] =
    MetricsSink.read(spark, base, MetricsSink.H1)
      .select(col("workspace_id"), col("metric"), col("bucket_ms"),
        round(col("sum"), 2).as("s"), col("count"),
        size(col("buckets")).as("nb"), col("samples_count"))
      .collect().map(_.toString).sorted

  private def directCascade(fromMs: Long): DataFrame = {
    val fresh = raw().filter(col("ts_ms") >= fromMs)
    Rollup.rollup1hFull(Rollup.rollup5mFull(
      Rollup.rollup1mFull(fresh, keys, col("ts_ms"), col("event_id")),
      keys), keys)
  }

  // refresh instants chosen bucket-aligned (midnight UTC) inside the events span
  private val NowA = java.time.Instant.parse("2024-01-10T00:00:00Z").toEpochMilli
  private val NowB = java.time.Instant.parse("2024-01-27T00:00:00Z").toEpochMilli
  private val Day = 86400000L

  test("cascade equals the direct batch cascade over the 1m freshness window") {
    val base = freshBase()
    RollupMaintenance.refreshCascade(spark, base, NowA, keys,
      col("ts_ms"), col("event_id"))
    val expected = directCascade(NowA - Day)
      .select(col("workspace_id"), col("metric"), col("bucket_ms"),
        round(col("sum"), 2).as("s"), col("count"),
        size(col("buckets")).as("nb"), col("samples_count"))
      .collect().map(_.toString).sorted
    assert(h1Rows(base).sameElements(expected))
    assert(expected.nonEmpty)
  }

  test("refresh is idempotent: re-running converges to the same rows") {
    val base = freshBase()
    RollupMaintenance.refreshCascade(spark, base, NowA, keys,
      col("ts_ms"), col("event_id"))
    val once = h1Rows(base)
    RollupMaintenance.refreshCascade(spark, base, NowA, keys,
      col("ts_ms"), col("event_id"))
    assert(h1Rows(base).sameElements(once))
  }

  test("mid-day edge preserves same-day pre-window buckets in a DAILY partition") {
    // The keep-scan is restricted to the single edge-straddling partition and
    // skipped when the edge is partition-aligned. This pins the case where it
    // must NOT be skipped: a mid-day window edge leaves that morning's 1m
    // buckets pre-window inside a daily partition about to be rewritten.
    val base = freshBase()
    RollupMaintenance.refreshCascade(spark, base, NowA, keys,
      col("ts_ms"), col("event_id"))
    val morning = MetricsSink.read(spark, base, MetricsSink.M1)
      .filter(col("bucket_ms") >= NowA - Day && col("bucket_ms") < NowA - Day / 2)
      .select(col("workspace_id"), col("metric"), col("bucket_ms"),
        col("samples_count"))
      .collect().map(_.toString).sorted
    assert(morning.nonEmpty)
    val NowC = NowA + Day / 2 // edge NowC − 1d = NowA − 12h: mid-day on Jan 9
    RollupMaintenance.refreshCascade(spark, base, NowC, keys,
      col("ts_ms"), col("event_id"))
    val after = MetricsSink.read(spark, base, MetricsSink.M1)
      .filter(col("bucket_ms") >= NowA - Day && col("bucket_ms") < NowA - Day / 2)
      .select(col("workspace_id"), col("metric"), col("bucket_ms"),
        col("samples_count"))
      .collect().map(_.toString).sorted
    assert(after.sameElements(morning), "same-day pre-window 1m rows were clobbered")
  }

  test("retention-dropped source never deletes stored target rollups (coverage clamp)") {
    // The 1m freshness window (1d) reaches further back than raw is retained
    // (3h). Once retention drops yesterday's raw partition, a refresh whose
    // window edge falls mid-yesterday must NOT rewrite yesterday's 1m
    // partition as keep(< edge) ∪ recompute(nothing) — that silently deletes
    // every stored bucket between the edge and midnight. The clamp pins the
    // window to surviving source coverage instead.
    val base = freshBase()
    val Now1 = java.time.Instant.parse("2024-01-10T04:00:00Z").toEpochMilli
    RollupMaintenance.refreshCascade(spark, base, Now1, keys,
      col("ts_ms"), col("event_id"))
    def m1Rows() = MetricsSink.read(spark, base, MetricsSink.M1)
      .select(col("workspace_id"), col("metric"), col("bucket_ms"),
        col("samples_count"))
      .collect().map(_.toString).sorted
    val before = m1Rows()
    // buckets in yesterday's partition AFTER the next refresh's window edge —
    // exactly the span the bug deletes
    val edge = java.time.Instant.parse("2024-01-09T07:00:00Z").toEpochMilli
    val midnight = java.time.Instant.parse("2024-01-10T00:00:00Z").toEpochMilli
    val exposed = MetricsSink.read(spark, base, MetricsSink.M1)
      .filter(col("bucket_ms") >= edge && col("bucket_ms") < midnight).count()
    assert(exposed > 0, "fixture must populate the raw-droppable span")
    // raw's 3h retention drops the Jan-9 partition at Now2
    val Now2 = java.time.Instant.parse("2024-01-10T07:00:00Z").toEpochMilli
    val dropped = MetricsSink.dropExpiredPartitions(spark, base,
      MetricsSink.Raw, Now2)
    assert(dropped.contains("2024-01-09"))
    RollupMaintenance.refreshCascade(spark, base, Now2, keys,
      col("ts_ms"), col("event_id"))
    assert(m1Rows().sameElements(before),
      "1m rollups for the raw-dropped span were deleted")
  }

  test("later refresh preserves pre-window buckets in the same monthly partition") {
    val base = freshBase()
    RollupMaintenance.refreshCascade(spark, base, NowA, keys,
      col("ts_ms"), col("event_id"))
    val old = h1Rows(base)
    RollupMaintenance.refreshCascade(spark, base, NowB, keys,
      col("ts_ms"), col("event_id"))
    val now = h1Rows(base).toSet
    // Jan-9/10 buckets (from NowA's window) must survive NowB's refresh even
    // though the 5m tier's fresh window no longer reaches them and both live
    // in the same 202401 monthly partition.
    assert(old.forall(now.contains), "pre-window rows were clobbered")
    // and NowB's own window produced new buckets
    val newBuckets = MetricsSink.read(spark, base, MetricsSink.H1)
      .filter(col("bucket_ms") >= NowB - Day).count()
    assert(newBuckets > 0)
  }
}
