package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.{Bucket, MetricPoint}

/** Scale hardening for the stateful streaming paths: the default in-heap
  * HDFSBackedStateStoreProvider keeps every series' conversion state and
  * every open window pane on the executor heap — at 100× series cardinality
  * that is the first thing to fall over. Production deployments at that
  * scale run the RocksDB provider (state off-heap, spill-to-disk, bounded
  * memory). These specs pin that graft's stateful operators — the
  * flatMapGroupsWithState conversion AND the three-deep chained windowed
  * aggregation — produce byte-identical results under
  * RocksDBStateStoreProvider, including state carried across micro-batches
  * and across a checkpointed restart, so flipping the provider at
  * deployment time is a pure capacity decision, never a semantics one. */
class RocksDBStateStoreSpec extends SparkSpec {

  private val RocksDB =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"

  /** Run `body` with the session-level state-store provider swapped; the
    * provider is resolved per query start, so this scopes it to the queries
    * `body` launches. */
  private def withRocksDB[T](body: => T): T = {
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDB)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None => spark.conf.unset(ProviderKey)
    }
  }

  private def mp(series: Long, tsMs: Long, v: Double): MetricPoint =
    MetricPoint("ws", series, s"m$series", new Timestamp(tsMs),
      metric_type = 2, temporality = 1, is_monotonic = true,
      value = Some(v), count = None, sum = None, buckets = Nil)

  private def runConvert(name: String, batches: Seq[Seq[MetricPoint]]): Seq[(Long, Long, Double, Boolean)] = {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val mem = MemoryStream[MetricPoint]
    val q = StreamingTemporality.convertDelta(mem.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      s.table(name).as[DeltaPoint].collect().toSeq
        .map(p => (p.series_hash, p.ts_ms, p.delta.get, p.is_reset))
        .sortBy(t => (t._1, t._2))
    } finally q.stop()
  }

  test("convertDelta under RocksDB == default provider == foldSeries") {
    val rnd = new scala.util.Random(7)
    val pts: Seq[MetricPoint] = for {
      s <- 40L to 44L
      i <- 1 to 30
    } yield {
      val v = i * 20.0 + rnd.nextInt(15) - (if (rnd.nextInt(8) == 0) i * 19 else 0)
      mp(s, i * 1000L, math.max(0.0, v))
    }
    // state must carry ACROSS batches in both providers — split mid-series
    val batches = Seq(pts.filter(_.timestamp.getTime <= 11000),
      pts.filter(p => p.timestamp.getTime > 11000 && p.timestamp.getTime <= 23000),
      pts.filter(_.timestamp.getTime > 23000))
    val fold = pts.groupBy(_.series_hash).toSeq.flatMap { case (_, ps) =>
      StreamingTemporality.foldSeries(None, ps.sortBy(_.timestamp.getTime))._2
    }.map(p => (p.series_hash, p.ts_ms, p.delta.get, p.is_reset))
      .sortBy(t => (t._1, t._2))
    val default = runConvert("rdb_default", batches)
    val rocks = withRocksDB { runConvert("rdb_rocks", batches) }
    assert(default === fold, "default provider diverges from foldSeries")
    assert(rocks === fold, "RocksDB provider diverges from foldSeries")
  }

  test("three-deep chained windowed aggs under RocksDB == default provider") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    def hp(series: Long, tsMs: Long, c: Long, sm: Double, b1: Long, b2: Long) =
      MetricPoint("ws", series, s"h$series", new Timestamp(tsMs), 3, 1, true,
        None, Some(c), Some(sm), Seq(Bucket(1.0, b1), Bucket(5.0, b2)),
        attributes = Map("m" -> s"h$series"))
    val pts = Seq(
      hp(1, 2 * 60000 + 5000, 10, 2.0, 3, 7), hp(1, 7 * 60000, 25, 5.0, 9, 20),
      hp(1, 40 * 60000, 5, 1.0, 1, 4), hp(1, 70 * 60000, 12, 3.0, 2, 6),
      hp(2, 2 * 60000, 6, 4.0, 2, 5))
    def run(name: String): Seq[Seq[Any]] = {
      val mem = MemoryStream[MetricPoint]
      val q = StreamingTemporality.rollup1hFullStreaming(
          mem.toDS().toDF().withColumn("value", col("value").cast("double")),
          tsCol = "timestamp", lateness = "0 seconds")
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      val got = try {
        mem.addData(pts: _*)
        q.processAllAvailable()
        mem.addData(hp(1, 180 * 60000, 1, 1.0, 0, 0)) // hour 3: flush 0-1
        q.processAllAvailable()
        s.table(name)
      } finally q.stop()
      got
        .withColumn("buckets",
          array_sort(col("buckets").cast("array<struct<le:double,count:bigint>>")))
        .withColumn("attributes", map_entries(col("attributes"))(0).getField("value"))
        .collect().map(_.toSeq: Seq[Any]).toSeq.sortBy(_.toString)
    }
    val default = run("rdb_casc_default")
    val rocks = withRocksDB { run("rdb_casc_rocks") }
    assert(rocks === default)
    assert(default.length === 3) // (s1 hour0, s1 hour1, s2 hour0)
  }

  test("20k-series cardinality soak: RocksDB carries every series' state across batches") {
    // the honest scale risk the in-heap provider has at 100x cardinality:
    // per-series conversion state for tens of thousands of live series.
    // Three micro-batches over 20k distinct series; every series' second and
    // third point must convert as a delta (proving its state was found in
    // the store on every batch — one first-point raw per series, no resets).
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val n = 20000
    def batch(i: Int): Seq[MetricPoint] =
      (0 until n).map(k => mp(k.toLong, i * 1000L, i * 10.0 + k % 7))
    withRocksDB {
      val mem = MemoryStream[MetricPoint]
      val q = StreamingTemporality.convertDelta(mem.toDS())
        .writeStream.format("memory").queryName("rdb_card")
        .outputMode("append").start()
      try {
        (1 to 3).foreach { i => mem.addData(batch(i): _*); q.processAllAvailable() }
        val out = s.table("rdb_card")
        assert(out.count() === 3L * n)
        val agg = out.agg(
          sum(col("delta")), sum(when(col("is_reset"), 1).otherwise(0)),
          count_distinct(col("series_hash"))).collect()(0)
        // per series: raw first point (10 + k%7) then two deltas of 10.0 —
        // total sum = sum over k of (30 + k%7)
        val expected = (0 until n).map(k => 30.0 + k % 7).sum
        assert(agg.getDouble(0) === expected)
        assert(agg.getLong(1) === 0L, "no series may reset")
        assert(agg.getLong(2) === n.toLong)
      } finally q.stop()
    }
  }

  test("checkpointed restart reloads RocksDB state across queries") {
    val s = spark
    import s.implicits._
    withRocksDB {
      val dir = java.nio.file.Files.createTempDirectory("rdb_ckpt").toString
      val (in, sink, ckpt) = (s"$dir/in", s"$dir/sink", s"$dir/ckpt")
      def startQuery() = StreamingTemporality.start(
        s.readStream.schema(Seq(mp(50, 0, 0)).toDS().schema).parquet(in)
          .as[MetricPoint],
        sinkDir = sink, checkpointDir = ckpt, intervalMs = 100)
      Seq(mp(50, 1000, 100), mp(50, 2000, 150)).toDS()
        .coalesce(1).write.mode("append").parquet(in)
      val q1 = startQuery()
      try q1.processAllAvailable() finally q1.stop()
      // the restarted query must load series state back out of the RocksDB
      // checkpoint: 200 converts as 200-150=50, not a first-point raw 200
      Seq(mp(50, 3000, 200)).toDS().coalesce(1).write.mode("append").parquet(in)
      val q2 = startQuery()
      try q2.processAllAvailable() finally q2.stop()
      val out = s.read.parquet(sink).as[DeltaPoint].collect().toSeq.sortBy(_.ts_ms)
      assert(out.map(_.delta.get) == Seq(100.0, 50.0, 50.0))
    }
  }
}
