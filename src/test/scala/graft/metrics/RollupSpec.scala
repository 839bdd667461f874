package graft.metrics

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the rollup cascade's FAITHFUL-but-surprising semantics (reference:
  * schema.sql:249-283, 340-374) so nobody "fixes" them silently:
  * coarser tiers read the previous TIER, so their averages are averages of
  * averages, NOT sample-weighted. */
class RollupSpec extends SparkSpec {

  private val keys = Seq(col("ws"), col("m"))

  private def raw(rows: (String, String, Long, Double, Long)*) = {
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    rows.toSeq.toDF("ws", "m", "ts_ms", "value", "seq")
  }

  test("5m average is avg-of-avgs, not sample-weighted (schema.sql:262)") {
    // minute 0: values [10, 20, 30] (avg 20, n=3); minute 1: [100] (avg 100, n=1)
    val df = raw(
      ("w", "a", 0L, 10.0, 1L), ("w", "a", 1000L, 20.0, 2L),
      ("w", "a", 2000L, 30.0, 3L), ("w", "a", 60000L, 100.0, 4L))
    val m5 = Rollup.rollup5m(
      Rollup.rollup1m(df, keys, col("ts_ms"), col("value"), col("seq")), keys)
      .select(col("value_avg"), col("samples_count")).collect()(0)
    // faithful: (20 + 100) / 2 = 60 — NOT the weighted (10+20+30+100)/4 = 40
    assert(m5.getDouble(0) === 60.0)
    assert(m5.getLong(1) === 4L) // samples_count SUMS through tiers
  }

  test("value_last follows the ingestion sequence through all tiers") {
    val df = raw(
      ("w", "a", 0L, 5.0, 10L),      // minute 0, latest seq of its minute
      ("w", "a", 1000L, 7.0, 2L),
      ("w", "a", 60000L, 9.0, 3L))   // minute 1
    val h1 = Rollup.rollup1h(Rollup.rollup5m(
      Rollup.rollup1m(df, keys, col("ts_ms"), col("value"), col("seq")),
      keys), keys)
    // global max seq = 10 → its value (5.0) is anyLast at every tier
    assert(h1.select(col("value_last")).collect()(0).getDouble(0) === 5.0)
  }

  test("bucketMs is integer-exact at bucket boundaries") {
    val b = Rollup.bucketMs(lit(119999L), 60000L)
    val c = Rollup.bucketMs(lit(120000L), 60000L)
    val r = spark.range(1).select(b.as("b"), c.as("c")).collect()(0)
    assert(r.getLong(0) === 60000L)
    assert(r.getLong(1) === 120000L)
  }

  test("rollup1mFull concatenates bucket snapshots (groupArray) without merging") {
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    val df = Seq(
      ("w", "a", 0L, 1.0, 1L, 10L, 5.0, Seq((0.1, 1L), (1.0, 2L)), 0, 0L, 0.25,
        Seq((1, 1L)), Seq((-1, 7L)), Map("k" -> "v")),
      ("w", "a", 1000L, 2.0, 2L, 20L, 6.0, Seq((0.1, 3L), (1.0, 4L)), 0, 1L, 0.25,
        Seq((1, 2L)), Seq((-1, 8L), (-2, 9L)), Map("k" -> "v")))
      .toDF("ws", "m", "ts_ms", "value", "seq", "count", "sum", "buckets",
        "exp_scale", "exp_zero_count", "exp_zero_threshold",
        "exp_positive_buckets", "exp_negative_buckets", "attributes")
      .withColumn("buckets",
        col("buckets").cast("array<struct<le:double,count:bigint>>"))
      .withColumn("exp_positive_buckets",
        col("exp_positive_buckets").cast("array<struct<index:int,count:bigint>>"))
      .withColumn("exp_negative_buckets",
        col("exp_negative_buckets").cast("array<struct<index:int,count:bigint>>"))
    val out = Rollup.rollup1mFull(df, keys, col("ts_ms"), col("seq"))
      .select(col("count"), col("sum"), size(col("buckets")),
        col("exp_zero_count"), size(col("exp_positive_buckets")),
        col("samples_count"), col("exp_zero_threshold"),
        size(col("exp_negative_buckets"))).collect()(0)
    assert(out.getLong(0) === 30L)        // sum(count)
    assert(out.getDouble(1) === 11.0)     // sum(sum)
    assert(out.getInt(2) === 4)           // 2 snapshots × 2 buckets, concatenated
    assert(out.getLong(3) === 1L)         // sum(exp_zero_count)
    assert(out.getInt(4) === 2)           // exp snapshots concatenated
    assert(out.getLong(5) === 2L)
    assert(out.getDouble(6) === 0.25)     // any(exp_zero_threshold)
    assert(out.getInt(7) === 3)           // negative snapshots concatenated
  }

  test("mergeTierBuckets stores bound-summed vectors, read-equivalent to the concat") {
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    val df = Seq(
      ("w", "a", 0L, 1.0, 1L, 10L, 5.0, Seq((0.1, 1L), (1.0, 2L)), 0, 0L, 0.25,
        Seq((1, 1L)), Seq((-1, 7L)), Map("k" -> "v")),
      ("w", "a", 1000L, 2.0, 2L, 20L, 6.0, Seq((0.1, 3L), (1.0, 4L)), 0, 1L, 0.25,
        Seq((1, 2L)), Seq((-1, 8L)), Map("k" -> "v")))
      .toDF("ws", "m", "ts_ms", "value", "seq", "count", "sum", "buckets",
        "exp_scale", "exp_zero_count", "exp_zero_threshold",
        "exp_positive_buckets", "exp_negative_buckets", "attributes")
      .withColumn("buckets",
        col("buckets").cast("array<struct<le:double,count:bigint>>"))
      .withColumn("exp_positive_buckets",
        col("exp_positive_buckets").cast("array<struct<index:int,count:bigint>>"))
      .withColumn("exp_negative_buckets",
        col("exp_negative_buckets").cast("array<struct<index:int,count:bigint>>"))
    def vec(r: org.apache.spark.sql.Row): Seq[(Double, Long)] =
      r.getSeq[org.apache.spark.sql.Row](0).map(b => (b.getDouble(0), b.getLong(1)))
    // 1m merged: two snapshots' bounds summed, sorted — NOT four entries
    val m1m = Rollup.rollup1mFull(df, keys, col("ts_ms"), col("seq"),
      mergeTierBuckets = true)
    assert(vec(m1m.select(col("buckets")).collect()(0)) ===
      Seq((0.1, 4L), (1.0, 6L)))
    // exp concats are untouched by the flag (1m-only columns, scale-aware
    // merge stays a read-time concern)
    assert(m1m.select(size(col("exp_positive_buckets"))).collect()(0).getInt(0) === 2)
    // cascading merged 1m with the flag keeps the bound-summed form, and the
    // bound→count multiset equals a read-time merge of the concat cascade —
    // the split-invariance of HistogramMathPropSpec, here through the tiers
    val m1c = Rollup.rollup1mFull(df, keys, col("ts_ms"), col("seq"))
    val m5m = Rollup.rollup5mFull(m1m, keys, mergeTierBuckets = true)
    val m5c = Rollup.rollup5mFull(m1c, keys)
    assert(vec(m5m.select(col("buckets")).collect()(0)) ===
      Seq((0.1, 4L), (1.0, 6L)))
    val mergedOfConcat = vec(m5c.groupBy(keys: _*)
      .agg(graft.functions.MergeBucketsAgg.merge(col("buckets")).as("buckets"))
      .select(col("buckets")).collect()(0))
    assert(mergedOfConcat === Seq((0.1, 4L), (1.0, 6L)))
  }
}
