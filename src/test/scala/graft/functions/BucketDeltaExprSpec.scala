package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.metrics.Temporality

/** The native bucket-delta expression must be bit-identical to the HOF
  * reference shape, including the last-wins rule for duplicate bounds and
  * the raw-count passthrough for bounds absent from the previous snapshot. */
class BucketDeltaExprSpec extends SparkSpec {

  private val BucketT = "array<struct<le:double,count:bigint>>"

  test("native delta == HOF delta on snapshots derived from events") {
    import graft.metrics.EventsMetrics
    import org.apache.spark.sql.expressions.Window
    // per-series minutely cumulative snapshots with a synthetic bound vector
    val snaps = EventsMetrics.fromEvents(spark, Sf)
      .groupBy(col("workspace_id"), col("metric"),
        (col("ts_ms") - pmod(col("ts_ms"), lit(3600000L))).as("hour_ms"))
      .agg(array_sort(collect_list(
        struct(round(col("value"), 0).as("le"),
          col("user_id").as("count")))).as("buckets"))
    val w = Window.partitionBy(col("workspace_id"), col("metric"))
      .orderBy(col("hour_ms"))
    val both = snaps
      .withColumn("prev", lag(col("buckets"), 1).over(w))
      .withColumn("native",
        Temporality.deltaBuckets(col("buckets"), col("prev"), lit(false)))
      .withColumn("hof",
        Temporality.deltaBucketsHof(col("buckets"), col("prev"), lit(false)))
      .filter(not(col("native") === col("hof")))
    assert(both.count() === 0)
  }

  test("last-wins duplicate bounds, absent-bound passthrough, reset arm") {
    val buckets = expr(
      "array(struct(1.0d as le, 10L as count), struct(2.0d as le, 7L as count))")
    // duplicate le=1.0 in prev: last (count=4) wins; le=2.0 absent → raw 7
    val prevDup = expr(
      "array(struct(1.0d as le, 3L as count), struct(1.0d as le, 4L as count))")
    val r = spark.range(1).select(
        Temporality.deltaBuckets(buckets, prevDup, lit(false)).as("d"),
        Temporality.deltaBucketsHof(buckets, prevDup, lit(false)).as("h"),
        Temporality.deltaBuckets(buckets, prevDup, lit(true)).as("reset"),
        Temporality.deltaBuckets(buckets, lit(null).cast(BucketT), lit(false))
          .as("first"))
      .collect()(0)
    val d = r.getSeq[org.apache.spark.sql.Row](0)
    assert(d === r.getSeq[org.apache.spark.sql.Row](1))
    assert(d(0).getDouble(0) === 1.0 && d(0).getLong(1) === 6L) // 10 - 4 (last)
    assert(d(1).getDouble(0) === 2.0 && d(1).getLong(1) === 7L) // absent → raw
    assert(r.getSeq[org.apache.spark.sql.Row](2) === r.getSeq[org.apache.spark.sql.Row](3))
  }

  test("null elements and null fields mirror the HOF shape") {
    // null current element → struct(null, null); null prev element / null
    // prev le matches nothing; matched prev with null count coalesces to 0;
    // null current count → null delta
    val buckets = expr(
      """array(struct(1.0d as le, 10L as count),
        |      cast(null as struct<le:double,count:bigint>),
        |      struct(cast(null as double) as le, 5L as count),
        |      struct(3.0d as le, cast(null as bigint) as count))""".stripMargin)
    val prev = expr(
      """array(struct(1.0d as le, cast(null as bigint) as count),
        |      cast(null as struct<le:double,count:bigint>),
        |      struct(cast(null as double) as le, 9L as count))""".stripMargin)
    val r = spark.range(1).select(
        Temporality.deltaBuckets(buckets, prev, lit(false)).as("d"),
        Temporality.deltaBucketsHof(buckets, prev, lit(false)).as("h"))
      .collect()(0)
    val d = r.getSeq[org.apache.spark.sql.Row](0)
    assert(d === r.getSeq[org.apache.spark.sql.Row](1))
    assert(d(0).getDouble(0) === 1.0 && d(0).getLong(1) === 10L) // null pc → 0
    assert(d(1).isNullAt(0) && d(1).isNullAt(1))
    assert(d(2).isNullAt(0) && d(2).getLong(1) === 5L)
    assert(d(3).getDouble(0) === 3.0 && d(3).isNullAt(1))
  }
}
