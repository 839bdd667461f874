package graft.streaming

import org.apache.spark.sql.functions._

import graft.{DocumentsApp, SparkSpec}
import graft.model.Tables

/** The live corpus dashboard (r13): DocumentsApp.corpusStats over a
  * STREAMING stamped ingest must equal the batch q_corpus_stats roll-up on
  * the same documents — the rollup-cascade streaming-twin pattern applied
  * to the LLM side. Stats are stamped once per micro-batch at ingest; the
  * dashboard is one complete-mode stateful aggregation. */
class StreamingCorpusStatsSpec extends SparkSpec {

  test("streaming corpus stats equal the batch roll-up on the same docs") {
    val s = spark
    import s.implicits._
    val docs = Tables.documents(spark, Sf).select(col("doc_id"), col("text"))
    val batch = DocumentsApp.corpusStats(DocumentsApp.stampStats(docs))
      .orderBy(col("lang_pred"))
      .collect().map(_.toString).toSeq
    assert(batch.nonEmpty)

    // stream the same rows through three micro-batches
    val rows = docs.as[(Long, String)].collect()
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val mem =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val stamped = DocumentsApp.stampStats(
      mem.toDF().toDF("doc_id", "text"))
    val q = DocumentsApp.corpusStats(stamped)
      .writeStream.format("memory").queryName("corpus_live")
      .outputMode("complete").start()
    try {
      rows.grouped(math.max(rows.length / 3, 1)).foreach { b =>
        mem.addData(b.toSeq: _*); q.processAllAvailable()
      }
    } finally q.stop()
    val streaming = spark.table("corpus_live")
      .orderBy(col("lang_pred")).collect().map(_.toString).toSeq
    assert(streaming === batch)
  }
}
