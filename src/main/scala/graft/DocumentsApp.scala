package graft

import java.io.FileInputStream
import java.util.Properties

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.llm.TextAnalysis
import graft.sources.DocumentSource

/** Config-driven documents-ingest pipeline — the LLM-corpus twin of
  * [[GraftApp]]'s metrics pipeline. One streaming query: JSONL landing dir →
  * explicit-schema parse → ingest-boundary exact dedup (watermark-bounded
  * state) → clean rows appended to the corpus, malformed lines appended to a
  * quarantine table, both from the same micro-batch.
  *
  * Design notes, 100 TB posture:
  *
  *   - Dedup runs in the STREAMING plan (`dropDuplicatesWithinWatermark`),
  *     not inside foreachBatch — cross-micro-batch state lives in the state
  *     store (RocksDB-capable) and survives checkpointed restarts, so a
  *     re-dropped file or a crash never re-admits duplicates inside the
  *     horizon.
  *   - One source read feeds both outputs: the quarantine split happens in
  *     foreachBatch on the deduped frame, not as a second streaming query
  *     that would re-read the landing dir.
  *   - Corrupt rows get a content-keyed fingerprint (xxhash64 of the raw
  *     line) so identical junk within the horizon collapses to one
  *     quarantine record (log-spam suppression) while distinct junk all
  *     lands. Clean rows key on the normalized-text fingerprint as in
  *     [[graft.llm.StreamingDedup]].
  *   - Event time is the ingest micro-batch timestamp: crawl lines carry no
  *     event time of their own in the pinned schema, and an ingest-time
  *     horizon is exactly the "remember recent fingerprints" contract the
  *     prefilter wants. Batch compaction downstream stays the global
  *     guarantee, as documented on StreamingDedup.
  *
  * Config keys (java properties):
  *   source.dir, storage.dir, checkpoint.dir,
  *   dedup.horizon (default "1 hour"), source.max_files_per_trigger,
  *   source.clean (off|delete|archive), source.archive_dir
  */
case class DocumentsConfig(
    sourceDir: String,
    storageDir: String,
    checkpointDir: String,
    horizon: String = "1 hour",
    maxFilesPerTrigger: Int = 16,
    sourceClean: String = "off",
    sourceArchiveDir: Option[String] = None)

object DocumentsApp {

  def load(path: String): DocumentsConfig = {
    val p = new Properties()
    val in = new FileInputStream(path)
    try p.load(in) finally in.close()
    def get(k: String): Option[String] = Option(p.getProperty(k))
    def req(k: String): String = get(k).getOrElse(
      throw new IllegalArgumentException(s"missing config key: $k"))
    DocumentsConfig(
      sourceDir = req("source.dir"),
      storageDir = req("storage.dir"),
      checkpointDir = req("checkpoint.dir"),
      horizon = get("dedup.horizon").getOrElse("1 hour"),
      maxFilesPerTrigger =
        get("source.max_files_per_trigger").map(_.toInt).getOrElse(16),
      sourceClean = get("source.clean").getOrElse("off"),
      sourceArchiveDir = get("source.archive_dir"))
  }

  def start(spark: SparkSession, cfg: DocumentsConfig,
      trigger: Trigger = null): StreamingQuery = {
    val parsed = DocumentSource.jsonlStream(spark, cfg.sourceDir,
        cfg.maxFilesPerTrigger, cfg.sourceClean, cfg.sourceArchiveDir)
      .withColumn("ingested_at", current_timestamp())
      // date partition for both outputs (UTC session — same convention as
      // the metrics sink's daily partitions)
      .withColumn("p_date", date_format(col("ingested_at"), "yyyy-MM-dd"))
      // clean rows: normalized-text fingerprint (the dedup key);
      // corrupt rows: content hash of the raw line, so distinct junk never
      // collides with documents and identical junk collapses in-horizon
      .withColumn("fp",
        when(col(DocumentSource.CorruptCol).isNull,
          TextAnalysis.fingerprint(col("text")))
          .otherwise(xxhash64(col(DocumentSource.CorruptCol))))
      .withWatermark("ingested_at", cfg.horizon)
      .dropDuplicatesWithinWatermark("fp")

    val writer = parsed.writeStream
      .option("checkpointLocation", cfg.checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val b = batch.persist()
        try {
          b.filter(col(DocumentSource.CorruptCol).isNull)
            .drop(DocumentSource.CorruptCol)
            .write.mode("append")
            .partitionBy("p_date")
            .parquet(s"${cfg.storageDir}/corpus")
          val bad = b.filter(col(DocumentSource.CorruptCol).isNotNull)
            .select(col(DocumentSource.CorruptCol).as("raw"),
              col("ingested_at"), col("p_date"))
          if (!bad.isEmpty)
            bad.write.mode("append").partitionBy("p_date")
              .parquet(s"${cfg.storageDir}/quarantine")
        } finally b.unpersist()
        ()
      }
    Option(trigger).fold(writer)(writer.trigger).start()
  }

  def main(args: Array[String]): Unit = {
    val cfg = load(args.headOption.getOrElse(
      throw new IllegalArgumentException("usage: DocumentsApp <config.properties>")))
    val spark = Sessions.local()
    val q = start(spark, cfg)
    q.awaitTermination()
  }
}
