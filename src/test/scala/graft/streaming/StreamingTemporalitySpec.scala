package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.metrics.Temporality
import graft.model.{Bucket, MetricPoint}

/** ST1–ST7: streaming conversion must reproduce the reference's own test
  * sequences (test/temporality_test.go:20-95) and agree with the batch
  * window-function path on the same inputs — including state carried ACROSS
  * micro-batches. */
class StreamingTemporalitySpec extends SparkSpec {

  private def mp(series: Long, tsMs: Long, v: Double,
      monotonic: Boolean = true): MetricPoint =
    MetricPoint("ws", series, s"m$series", new Timestamp(tsMs),
      metric_type = 2, temporality = 1, is_monotonic = monotonic,
      value = Some(v), count = None, sum = None, buckets = Nil)

  private def runStreaming(batches: Seq[Seq[MetricPoint]]): Seq[DeltaPoint] = {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val mem = MemoryStream[MetricPoint]
    val q = StreamingTemporality.convertDelta(mem.toDS())
      .writeStream.format("memory").queryName("st_out")
      .outputMode("append").start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      s.table("st_out").as[DeltaPoint].collect().toSeq
        .sortBy(p => (p.series_hash, p.ts_ms))
    } finally q.stop()
  }

  test("property: foldSeries == batch window path == streaming on random sequences") {
    val rnd = new scala.util.Random(42)
    val pts: Seq[MetricPoint] = for {
      s <- 10L to 14L
      i <- 1 to 40
    } yield {
      // mostly-increasing counter with occasional dips → resets exercised
      val v = i * 25.0 + rnd.nextInt(20) - (if (rnd.nextInt(10) == 0) i * 24 else 0)
      mp(s, i * 1000L, math.max(0.0, v))
    }

    // pure fold, per series
    val fold = pts.groupBy(_.series_hash).toSeq.flatMap { case (_, ps) =>
      StreamingTemporality.foldSeries(None, ps.sortBy(_.timestamp.getTime))._2
    }.sortBy(p => (p.series_hash, p.ts_ms))
      .map(p => (p.series_hash, p.ts_ms, p.delta.get, p.is_reset))

    // batch window path on the same rows
    val s2 = spark
    import s2.implicits._
    val batch = Temporality.toDelta(pts.toDS().toDF(),
        Seq(col("series_hash")), Seq(col("timestamp")))
      .select(col("series_hash"), unix_millis(col("timestamp")).as("ts_ms"),
        col("delta"), col("is_reset"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(batch == fold, "batch window path diverges from foldSeries")

    // streaming path, random micro-batch splits (time-ordered)
    val cuts = Seq(7, 19, 26, 40)
    val batches = cuts.zip(0 +: cuts.dropRight(1)).map { case (hi, lo) =>
      pts.filter(p => p.timestamp.getTime / 1000 > lo && p.timestamp.getTime / 1000 <= hi)
    }
    val streamed = runStreaming(batches)
      .map(p => (p.series_hash, p.ts_ms, p.delta.get, p.is_reset))
    assert(streamed == fold, "streaming path diverges from foldSeries")
  }

  test("reference sequence [100,150,200] -> [100,50,50] across 2 micro-batches") {
    val pts = Seq(mp(1, 1000, 100), mp(1, 2000, 150), mp(1, 3000, 200))
    val out = runStreaming(Seq(pts.take(2), pts.drop(2)))
    assert(out.map(_.delta.get) == Seq(100.0, 50.0, 50.0))
    assert(out.map(_.is_reset) == Seq(false, false, false))
  }

  test("reference reset sequence [100,150,20,50] -> [100,50,20,30] (reset at 20)") {
    val pts = Seq(mp(2, 1000, 100), mp(2, 2000, 150), mp(2, 3000, 20), mp(2, 4000, 50))
    val out = runStreaming(Seq(pts.take(1), pts.slice(1, 3), pts.drop(3)))
    assert(out.map(_.delta.get) == Seq(100.0, 50.0, 20.0, 30.0))
    assert(out.map(_.is_reset) == Seq(false, false, true, false))
  }

  test("non-monotonic series never resets: [100,150,20] -> [100,50,-130]") {
    val pts = Seq(mp(3, 1000, 100, monotonic = false),
      mp(3, 2000, 150, monotonic = false), mp(3, 3000, 20, monotonic = false))
    val out = runStreaming(Seq(pts))
    assert(out.map(_.delta.get) == Seq(100.0, 50.0, -130.0))
    assert(out.forall(!_.is_reset))
  }

  test("histogram reset (count drop) emits the raw snapshot (temporality.go:166-172)") {
    val p1 = MetricPoint("ws", 8, "h", new Timestamp(1000), 3, 1, false,
      None, Some(100L), Some(50.0), Seq(Bucket(1.0, 60L), Bucket(10.0, 100L)))
    val p2 = MetricPoint("ws", 8, "h", new Timestamp(2000), 3, 1, false,
      None, Some(10L), Some(5.0), Seq(Bucket(1.0, 6L), Bucket(10.0, 10L)))
    val (_, out) = StreamingTemporality.foldSeries(None, Seq(p1, p2))
    assert(out(1).is_reset, "count drop 100 -> 10 must flag a reset")
    assert(out(1).delta_count === Some(10L)) // raw, not -90
    assert(out(1).delta_sum === Some(5.0))   // raw, not -45
    assert(out(1).delta_buckets === Seq(Bucket(1.0, 6L), Bucket(10.0, 10L)))
  }

  test("missing field on a point preserves prior state (temporality.go:100-105)") {
    val p1 = MetricPoint("ws", 7, "h", new Timestamp(1000), 3, 1, false,
      None, Some(100L), Some(50.0), Nil)
    val p2 = MetricPoint("ws", 7, "h", new Timestamp(2000), 3, 1, false,
      None, Some(150L), None, Nil) // no sum — lastSum must stay 50
    val p3 = MetricPoint("ws", 7, "h", new Timestamp(3000), 3, 1, false,
      None, Some(200L), Some(90.0), Nil)
    val (_, out) = StreamingTemporality.foldSeries(None, Seq(p1, p2, p3))
    assert(out(2).delta_sum === Some(40.0), "90 - 50 (preserved), not 90 - 0")
    assert(out(2).delta_count === Some(50L))
  }

  test("late point (ts <= state.lastTimestamp) is dropped (ST3/ST7)") {
    val out = runStreaming(Seq(
      Seq(mp(4, 1000, 100), mp(4, 3000, 150)),
      Seq(mp(4, 2000, 999), mp(4, 4000, 170)))) // 2000 arrives after 3000: late
    assert(out.map(_.ts_ms) == Seq(1000L, 3000L, 4000L))
    assert(out.map(_.delta.get) == Seq(100.0, 50.0, 20.0))
  }

  test("intra-batch disorder is sorted by event time before folding (ST7)") {
    val out = runStreaming(Seq(Seq(mp(5, 3000, 200), mp(5, 1000, 100), mp(5, 2000, 150))))
    assert(out.map(_.ts_ms) == Seq(1000L, 2000L, 3000L))
    assert(out.map(_.delta.get) == Seq(100.0, 50.0, 50.0))
  }

  test("histogram count/sum/buckets delta with bound alignment") {
    val p1 = MetricPoint("ws", 6, "h", new Timestamp(1000), 3, 1, true,
      None, Some(10L), Some(5.0), Seq(Bucket(0.5, 4), Bucket(1.0, 10)))
    val p2 = MetricPoint("ws", 6, "h", new Timestamp(2000), 3, 1, true,
      None, Some(25L), Some(9.0), Seq(Bucket(0.5, 9), Bucket(1.0, 25), Bucket(2.0, 3)))
    val out = runStreaming(Seq(Seq(p1), Seq(p2)))
    assert(out.map(_.delta_count) == Seq(Some(10L), Some(15L)))
    assert(out.map(_.delta_sum) == Seq(Some(5.0), Some(4.0)))
    assert(out(1).delta_buckets == Seq(Bucket(0.5, 5), Bucket(1.0, 15), Bucket(2.0, 3)))
  }

  test("streaming histogram fold == batch deltaGuarded/deltaBuckets twin") {
    // cross-twin lock for the HISTOGRAM arm (the scalar twin test is below):
    // the same cumulative snapshots through (a) the streaming per-series fold
    // and (b) the batch window path (resetFlag on count + deltaGuarded +
    // deltaBuckets) must emit identical deltas.
    val s = spark
    import s.implicits._
    def hp(series: Long, tsMs: Long, c: Long, sm: Double, b1: Long, b2: Long) =
      MetricPoint("ws", series, s"h$series", new Timestamp(tsMs), 3, 1, true,
        None, Some(c), Some(sm), Seq(Bucket(1.0, b1), Bucket(5.0, b2)))
    val pts = Seq(
      hp(1, 1000, 10, 2.0, 3, 7), hp(1, 2000, 25, 5.0, 9, 20),
      hp(1, 3000, 5, 1.0, 1, 4),  // count drop → reset, raw passthrough
      hp(1, 4000, 8, 3.0, 2, 6),
      hp(2, 1000, 0, 0.0, 0, 0),  // prev count/sum 0 → guarded passthrough
      hp(2, 2000, 6, 4.0, 2, 5))
    val streamed = runStreaming(pts.grouped(2).toSeq)
      .map(p => (p.series_hash, p.ts_ms,
        p.delta_count, p.delta_sum, p.delta_buckets))
    val w = Temporality.seriesWindow(Seq(col("series_hash")), Seq(col("ts_ms")))
    val reset = coalesce(Temporality.resetFlag(col("c"), w), lit(false))
    val batch = pts.map(p => (p.series_hash, p.timestamp.getTime,
        p.count.get, p.sum.get, p.buckets))
      .toDF("series_hash", "ts_ms", "c", "s", "b")
      .withColumn("b", col("b").cast("array<struct<le:double,count:bigint>>"))
      .select(col("series_hash"), col("ts_ms"),
        Temporality.deltaGuarded(col("c"), lag(col("c"), 1).over(w), reset)
          .as("dc"),
        Temporality.deltaGuarded(col("s"), lag(col("s"), 1).over(w), reset)
          .as("ds"),
        Temporality.deltaBuckets(col("b"), lag(col("b"), 1).over(w), reset)
          .as("db"))
      .as[(Long, Long, Long, Double, Seq[Bucket])]
      .collect().toSeq
      .map { case (sh, ts, dc, ds, db) => (sh, ts, Some(dc), Some(ds), db) }
      .sortBy(t => (t._1, t._2))
    assert(streamed === batch)
  }

  test("ST4: streaming 1m rollup matches batch rollup after watermark close") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val mem = MemoryStream[MetricPoint]
    val q = StreamingTemporality.rollup1m(
        mem.toDS().toDF().withColumn("value", col("value").cast("double")),
        tsCol = "timestamp", lateness = "0 seconds")
      .writeStream.format("memory").queryName("st_rollup")
      .outputMode("append").start()
    try {
      // minute 0 and minute 1 data, then a minute-3 point to advance the
      // watermark past minutes 0-1 so append mode emits them
      mem.addData(mp(20, 5000, 10), mp(20, 20000, 30), mp(20, 70000, 7))
      q.processAllAvailable()
      mem.addData(mp(20, 200000, 1))
      q.processAllAvailable()
      val rows = s.table("st_rollup")
        .select(col("bucket_ms"), col("value_min"), col("value_max"),
          col("value_avg"), col("value_last"), col("value_sum"), col("samples_count"))
        .collect().map(r => (r.getLong(0), (r.getDouble(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6)))).toMap
      assert(rows(0L) == ((10.0, 30.0, 20.0, 30.0, 40.0, 2L)))
      assert(rows(60000L) == ((7.0, 7.0, 7.0, 7.0, 7.0, 1L)))
    } finally q.stop()
  }

  test("ST4 full-width: streaming rollup1mFull == batch rollup1mFull") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    def hp(series: Long, tsMs: Long, c: Long, sm: Double, b1: Long, b2: Long) =
      MetricPoint("ws", series, s"h$series", new Timestamp(tsMs), 3, 1, true,
        None, Some(c), Some(sm), Seq(Bucket(1.0, b1), Bucket(5.0, b2)),
        attributes = Map("m" -> s"h$series"))
    val pts = Seq(
      hp(1, 5000, 10, 2.0, 3, 7), hp(1, 20000, 25, 5.0, 9, 20), // minute 0
      hp(1, 70000, 5, 1.0, 1, 4),                               // minute 1
      hp(2, 10000, 6, 4.0, 2, 5))                               // minute 0
    val mem = MemoryStream[MetricPoint]
    val q = StreamingTemporality.rollup1mFull(
        mem.toDS().toDF().withColumn("value", col("value").cast("double")),
        tsCol = "timestamp", lateness = "0 seconds")
      .writeStream.format("memory").queryName("st_rollup_full")
      .outputMode("append").start()
    val got = try {
      mem.addData(pts: _*)
      q.processAllAvailable()
      mem.addData(hp(1, 300000, 1, 1.0, 0, 0)) // advance watermark past 0-1
      q.processAllAvailable()
      s.table("st_rollup_full")
    } finally q.stop() // the memory-sink table outlives the query

    // batch twin over the identical rows; exp columns (absent from the point
    // stream by otlp.go:234-258) are stubbed as literals and dropped from the
    // comparison; collect order is arrival-dependent → compare arrays sorted
    val emptyExp = "array<struct<index:int,count:bigint>>"
    val batchIn = pts.toDS().toDF()
      .withColumn("value", col("value").cast("double"))
      .withColumn("ts_ms", unix_millis(col("timestamp")))
      .withColumn("exp_scale", lit(0))
      .withColumn("exp_zero_count", lit(0L))
      .withColumn("exp_zero_threshold", lit(0.0))
      .withColumn("exp_positive_buckets", array().cast(emptyExp))
      .withColumn("exp_negative_buckets", array().cast(emptyExp))
    val cmp = Seq("series_hash", "bucket_ms", "value_min", "value_max",
      "value_avg", "value_last", "count", "sum", "buckets_sorted",
      "attributes", "samples_count")
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("buckets_sorted",
        array_sort(col("buckets").cast("array<struct<le:double,count:bigint>>")))
      .withColumn("attributes", map_entries(col("attributes"))(0).getField("value"))
      .selectExpr(cmp: _*)
      .collect().map(_.toSeq).sortBy(_.toString)
    val batch = canon(graft.metrics.Rollup.rollup1mFull(batchIn,
      Seq(col("workspaceId"), col("metric"), col("series_hash")),
      col("ts_ms"), col("ts_ms")))
    val streamed = canon(got)
    assert(streamed === batch)
  }

  test("ST8 streaming cascade: chained 1m->5m windowed aggs == batch cascade") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    def hp(series: Long, tsMs: Long, c: Long, sm: Double, b1: Long, b2: Long) =
      MetricPoint("ws", series, s"h$series", new Timestamp(tsMs), 3, 1, true,
        None, Some(c), Some(sm), Seq(Bucket(1.0, b1), Bucket(5.0, b2)),
        attributes = Map("m" -> s"h$series"))
    // 5m bucket 0 (minutes 0,1,4) and 5m bucket 1 (minute 6); two series
    val pts = Seq(
      hp(1, 5000, 10, 2.0, 3, 7), hp(1, 70000, 25, 5.0, 9, 20),
      hp(1, 250000, 5, 1.0, 1, 4), hp(1, 380000, 12, 3.0, 2, 6),
      hp(2, 10000, 6, 4.0, 2, 5))
    val mem = MemoryStream[MetricPoint]
    val q = StreamingTemporality.rollup5mFullStreaming(
        mem.toDS().toDF().withColumn("value", col("value").cast("double")),
        tsCol = "timestamp", lateness = "0 seconds")
      .writeStream.format("memory").queryName("st_cascade")
      .outputMode("append").start()
    val got = try {
      mem.addData(pts: _*)
      q.processAllAvailable()
      mem.addData(hp(1, 1200000, 1, 1.0, 0, 0)) // minute 20: watermark past both 5m buckets
      q.processAllAvailable()
      s.table("st_cascade")
    } finally q.stop()

    // batch cascade over the identical rows (1m full tier -> 5m full tier);
    // collect order of the bucket concat is arrival-dependent in both
    // engines -> compare sorted
    val emptyExp = "array<struct<index:int,count:bigint>>"
    val batchIn = pts.toDS().toDF()
      .withColumn("value", col("value").cast("double"))
      .withColumn("ts_ms", unix_millis(col("timestamp")))
      .withColumn("exp_scale", lit(0))
      .withColumn("exp_zero_count", lit(0L))
      .withColumn("exp_zero_threshold", lit(0.0))
      .withColumn("exp_positive_buckets", array().cast(emptyExp))
      .withColumn("exp_negative_buckets", array().cast(emptyExp))
    val seriesCols = Seq(col("workspaceId"), col("metric"), col("series_hash"))
    val cmp = Seq("series_hash", "bucket_ms", "value_min", "value_max",
      "value_avg", "value_last", "count", "sum", "buckets_sorted",
      "attributes", "samples_count")
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("buckets_sorted",
        array_sort(col("buckets").cast("array<struct<le:double,count:bigint>>")))
      .withColumn("attributes", map_entries(col("attributes"))(0).getField("value"))
      .selectExpr(cmp: _*)
      .collect().map(_.toSeq).sortBy(_.toString)
    val batch = canon(graft.metrics.Rollup.rollup5mFull(
      graft.metrics.Rollup.rollup1mFull(batchIn, seriesCols,
        col("ts_ms"), col("ts_ms")), seriesCols))
    assert(canon(got) === batch)
  }

  test("ST8 three-tier streaming chain: 1m->5m->1h == batch cascade") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    def hp(series: Long, tsMs: Long, c: Long, sm: Double, b1: Long, b2: Long) =
      MetricPoint("ws", series, s"h$series", new Timestamp(tsMs), 3, 1, true,
        None, Some(c), Some(sm), Seq(Bucket(1.0, b1), Bucket(5.0, b2)),
        attributes = Map("m" -> s"h$series"))
    // hour 0 (minutes 2, 7, 40) and hour 1 (minute 70); two series in hour 0
    val pts = Seq(
      hp(1, 2 * 60000 + 5000, 10, 2.0, 3, 7), hp(1, 7 * 60000, 25, 5.0, 9, 20),
      hp(1, 40 * 60000, 5, 1.0, 1, 4), hp(1, 70 * 60000, 12, 3.0, 2, 6),
      hp(2, 2 * 60000, 6, 4.0, 2, 5))
    val mem = MemoryStream[MetricPoint]
    val q = StreamingTemporality.rollup1hFullStreaming(
        mem.toDS().toDF().withColumn("value", col("value").cast("double")),
        tsCol = "timestamp", lateness = "0 seconds")
      .writeStream.format("memory").queryName("st_cascade_1h")
      .outputMode("append").start()
    val got = try {
      mem.addData(pts: _*)
      q.processAllAvailable()
      mem.addData(hp(1, 180 * 60000, 1, 1.0, 0, 0)) // hour 3: flush hours 0-1
      q.processAllAvailable()
      s.table("st_cascade_1h")
    } finally q.stop()

    val emptyExp = "array<struct<index:int,count:bigint>>"
    val batchIn = pts.toDS().toDF()
      .withColumn("value", col("value").cast("double"))
      .withColumn("ts_ms", unix_millis(col("timestamp")))
      .withColumn("exp_scale", lit(0))
      .withColumn("exp_zero_count", lit(0L))
      .withColumn("exp_zero_threshold", lit(0.0))
      .withColumn("exp_positive_buckets", array().cast(emptyExp))
      .withColumn("exp_negative_buckets", array().cast(emptyExp))
    val seriesCols = Seq(col("workspaceId"), col("metric"), col("series_hash"))
    val cmp = Seq("series_hash", "bucket_ms", "value_min", "value_max",
      "value_avg", "value_last", "count", "sum", "buckets_sorted",
      "attributes", "samples_count")
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("buckets_sorted",
        array_sort(col("buckets").cast("array<struct<le:double,count:bigint>>")))
      .withColumn("attributes", map_entries(col("attributes"))(0).getField("value"))
      .selectExpr(cmp: _*)
      .collect().map(_.toSeq).sortBy(_.toString)
    val batch = canon(graft.metrics.Rollup.rollup1hFull(
      graft.metrics.Rollup.rollup5mFull(
        graft.metrics.Rollup.rollup1mFull(batchIn, seriesCols,
          col("ts_ms"), col("ts_ms")), seriesCols), seriesCols))
    assert(canon(got) === batch)
    assert(batch.length === 3) // (s1 hour0, s1 hour1, s2 hour0)
  }

  test("ST1/ST6: checkpointed restart carries series state across queries") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("st6").toString
    val (in, sink, ckpt) = (s"$dir/in", s"$dir/sink", s"$dir/ckpt")
    def startQuery() = StreamingTemporality.start(
      s.readStream.schema(Seq(mp(30, 0, 0)).toDS().schema).parquet(in)
        .as[MetricPoint],
      sinkDir = sink, checkpointDir = ckpt, intervalMs = 100)

    Seq(mp(30, 1000, 100), mp(30, 2000, 150)).toDS()
      .coalesce(1).write.mode("append").parquet(in)
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()

    // second query, same checkpoint: must resume state (not re-emit batch 1,
    // and compute 200-150=50, not a first-point raw 200)
    Seq(mp(30, 3000, 200)).toDS().coalesce(1).write.mode("append").parquet(in)
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()

    val out = s.read.parquet(sink).as[DeltaPoint].collect().toSeq.sortBy(_.ts_ms)
    assert(out.map(_.delta.get) == Seq(100.0, 50.0, 50.0))
  }

  test("streaming == batch window path on a multi-series mix") {
    val s = spark
    import s.implicits._
    val pts = for {
      series <- 10L to 14L
      i <- 0 to 19
    } yield mp(series, 1000L * (i + 1), (i * 7 + series * 3) % 50 + i / 4)
    // split into 4 uneven micro-batches, shuffled within each
    val batches = pts.grouped(25).map(g => scala.util.Random.shuffle(g.toSeq)).toSeq
    val streamed = runStreaming(batches)
      .map(p => (p.series_hash, p.ts_ms) -> (p.delta.get, p.is_reset)).toMap

    val batch = Temporality.toDelta(
        pts.toDF().withColumn("ts_ms", unix_millis(col("timestamp"))),
        Seq(col("series_hash")), Seq(col("ts_ms")))
      .select(col("series_hash"), col("ts_ms"), col("delta"), col("is_reset"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getDouble(2), r.getBoolean(3))).toMap

    assert(streamed == batch)
  }
}
