package graft.llm

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

case class StreamDoc(doc_id: Long, ts: Timestamp, text: String)

/** Streaming ingest-boundary dedup: exact duplicates (by normalized-text
  * fingerprint) are dropped within the watermark horizon, state is evicted
  * past it (re-admission is the documented bounded-state trade-off), and the
  * surviving set agrees with the batch [[Dedup.exact]] on the same rows.
  */
class StreamingDedupSpec extends SparkSpec {

  private def doc(id: Long, tsSec: Long, text: String): StreamDoc =
    StreamDoc(id, new Timestamp(tsSec * 1000L), text)

  private def runStream(batches: Seq[Seq[StreamDoc]]): Seq[(Long, String)] = {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val mem = MemoryStream[StreamDoc]
    val q = StreamingDedup.dedupExact(mem.toDS().toDF(), "ts", "10 seconds")
      .writeStream.format("memory").queryName("sd_out")
      .outputMode("append").start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      s.table("sd_out").select("doc_id", "text").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq.sortBy(_._1)
    } finally {
      q.stop()
      s.sql("DROP TABLE IF EXISTS sd_out")
    }
  }

  test("intra-batch and cross-batch duplicates within the horizon are dropped") {
    val out = runStream(Seq(
      Seq(doc(1, 100, "alpha beta"), doc(2, 100, "alpha  BETA "), // normalize-equal
        doc(3, 101, "gamma")),
      Seq(doc(4, 102, "alpha beta"), // cross-batch dup, inside horizon
        doc(5, 103, "delta"))))
    assert(out == Seq(1L -> "alpha beta", 3L -> "gamma", 5L -> "delta"))
  }

  test("fingerprint state is evicted past the watermark horizon (re-admission)") {
    val out = runStream(Seq(
      Seq(doc(1, 100, "alpha beta")),
      // advance event time far past 100s + 10s horizon → fp state evicted
      Seq(doc(2, 200, "unrelated")),
      // same text again, long after expiry: re-admitted BY DESIGN — the
      // bounded-state trade-off the batch compaction stage cleans up
      Seq(doc(3, 210, "alpha beta"))))
    assert(out.map(_._1) == Seq(1L, 2L, 3L))
  }

  test("surviving set agrees with batch Dedup.exact when all rows share the horizon") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      doc(10, 100, "one two three"), doc(11, 100, "one  two   three"),
      doc(12, 101, "four"), doc(13, 102, "four"), doc(14, 103, "five"))
    val streamed = runStream(Seq(docs.take(2), docs.drop(2))).map(_._1).toSet
    val batch = Dedup.exactSurvivors(docs.toDF(), col("doc_id"), col("text"))
      .select("doc_id").as[Long].collect().toSet
    assert(streamed == batch)
  }

  test("RocksDB state store: identical surviving set (provider is a capacity knob)") {
    // same requirement RocksDBStateStoreSpec pins for the metrics paths: at
    // crawl-scale fingerprint cardinality the dedup state runs off-heap, and
    // flipping the provider must never change which documents survive
    val provider = "spark.sql.streaming.stateStore.providerClass"
    val rocks =
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    // the watermark only advances AFTER a batch completes, so the eviction
    // probe (doc 7) needs its own batch following the one that moves event
    // time past gamma's horizon
    val batches = Seq(
      Seq(doc(1, 100, "alpha beta"), doc(2, 100, "alpha  BETA "), doc(3, 101, "gamma")),
      Seq(doc(4, 102, "alpha beta"), doc(5, 103, "delta")),
      Seq(doc(6, 200, "epsilon")),
      Seq(doc(7, 210, "gamma"))) // post-eviction re-admit
    val onHeap = runStream(batches)
    val prev = spark.conf.getOption(provider)
    spark.conf.set(provider, rocks)
    val onRocks =
      try runStream(batches)
      finally prev match {
        case Some(v) => spark.conf.set(provider, v)
        case None => spark.conf.unset(provider)
      }
    assert(onRocks == onHeap)
    assert(onHeap.map(_._1) == Seq(1L, 3L, 5L, 6L, 7L))
  }

  test("property: random batches, duplicates, and whitespace variants match batch dedup") {
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(7)
    // 120 docs over 40 base texts: ~3 duplicates per text, some as
    // whitespace/case variants that only normalize-equality can see
    val texts = (0 until 40).map(i => s"base text number $i with words")
    val docs = (0 until 120).map { id =>
      val t = texts(rnd.nextInt(texts.size))
      val variant = rnd.nextInt(3) match {
        case 0 => t
        case 1 => t.toUpperCase + "  "
        case 2 => "  " + t.replace(" ", "   ")
      }
      doc(id.toLong, 100 + id / 20, variant) // 20 docs per second of event time
    }
    // random time-ordered micro-batch splits (ts horizon 10s covers all 6s)
    val cuts = Seq(25, 40, 77, 98, 120)
    val batches = cuts.zip(0 +: cuts.dropRight(1)).map { case (hi, lo) =>
      docs.slice(lo, hi)
    }
    val streamed = runStream(batches).map(_._1).toSet
    val s = spark
    import s.implicits._
    val batch = Dedup.exactSurvivors(docs.toDF(), col("doc_id"), col("text"))
      .select("doc_id").as[Long].collect().toSet
    // arrival order == id order here, so first-arrival == min-id survivors
    assert(streamed == batch)
    assert(streamed.size < docs.size) // the fixture actually deduped
  }

  test("state is keyed by fp: the emitted schema carries the fingerprint") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val mem = MemoryStream[StreamDoc]
    val df = StreamingDedup.dedupExact(mem.toDS().toDF(), "ts", "10 seconds")
    assert(df.schema.fieldNames.contains("fp"))
    assert(df.schema("fp").dataType.typeName == "long")
  }
}
