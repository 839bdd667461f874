package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Batch document sources for the training-data pipeline: web-crawl dumps
  * and annotation exports arrive as JSONL or CSV, not parquet. Two design
  * rules carry the 100 TB posture:
  *
  *   - **Explicit schema, never inference.** Schema inference is a full
  *     extra pass over the input before the real read starts; at corpus
  *     scale that doubles ingest cost, and a single odd row can silently
  *     flip a column's inferred type between runs. The documents schema is
  *     pinned here once.
  *   - **Malformed rows are data, not exceptions.** One bad line in a
  *     billion must neither kill the job (FAILFAST) nor vanish (DROPMALFORMED).
  *     The readers parse via `from_json`/`from_csv` over a plain text scan —
  *     one pass, codegen-friendly, and free of the corrupt-column caveat of
  *     the DataFrameReader path (Spark disallows filtering on
  *     `_corrupt_record` alone without caching the parsed frame). A null
  *     parse result marks the row corrupt and [[quarantine]] splits the
  *     stream so bad rows can be counted, sampled, and re-driven.
  */
object DocumentSource {

  /** The documents table contract (TESTDATA.md), pinned once. */
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Marker column: the raw line for rows that failed to parse, null for
    * clean rows. Kept out of the documents schema so downstream operators
    * never see it after [[quarantine]]. */
  val CorruptCol = "_raw_corrupt"

  /** Required keys: a line whose parse cannot produce these is not a
    * document. Metadata fields (lang/source/n_chars) may be null on clean
    * rows — a missing FIELD is data, a missing DOCUMENT is corruption. */
  private val RequiredKeys = Seq("doc_id", "text")

  private def parsed(raw: DataFrame, parse: org.apache.spark.sql.Column): DataFrame =
    raw.select(parse.as("d"), col("value"))
      // a malformed line yields either a null struct (JSON) or a struct
      // whose required keys failed to parse (CSV PERMISSIVE puts nulls per
      // field) — both quarantine; partially-null metadata stays clean
      .select(col("d.*"),
        when(col("d").isNull ||
          RequiredKeys.map(f => col(s"d.$f").isNull).reduce(_ || _),
          col("value")).as(CorruptCol))

  /** One document per line as JSON (the crawl-dump interchange format). */
  def jsonl(spark: SparkSession, path: String): DataFrame =
    parsed(spark.read.text(path), from_json(col("value"), schema))

  /** Streaming twin of [[jsonl]]: tail a landing directory of JSONL files as
    * they arrive (crawl output dropped by fetchers). Same parse, same
    * quarantine contract — [[quarantine]] works unchanged on the result, and
    * the clean side composes directly with
    * [[graft.llm.StreamingDedup.dedupExact]] for ingest-boundary dedup once
    * an event-time column is stamped (crawl records carry their fetch time;
    * the caller maps it to a timestamp column). `maxFilesPerTrigger` bounds
    * micro-batch size so one large drop cannot stall the trigger cadence.
    *
    * `cleanSource` is the crawl landing zone's lifecycle (same rationale as
    * [[graft.streaming.OtlpSource.fileStream]]): fetchers drop files
    * forever, the source re-lists the zone every trigger, and at sustained
    * crawl volume the un-cleaned listing — not the data — becomes the
    * bottleneck. "delete" drops consumed drops, "archive" moves them under
    * `archiveDir`; the checkpoint keeps exactly-once either way. */
  def jsonlStream(spark: SparkSession, path: String,
      maxFilesPerTrigger: Int = 16,
      cleanSource: String = "off",
      archiveDir: Option[String] = None): DataFrame = {
    val base = spark.readStream
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .option("cleanSource", cleanSource)
    parsed(
      archiveDir.foldLeft(base)((b, d) => b.option("sourceArchiveDir", d))
        .text(path),
      from_json(col("value"), schema))
  }

  /** Comma-separated with no header row; `sep` for TSV exports. */
  def csv(spark: SparkSession, path: String, sep: String = ","): DataFrame =
    parsed(spark.read.text(path),
      from_csv(col("value"), schema, Map("sep" -> sep)))

  /** Split a parsed frame into (clean documents, quarantined raw lines).
    * Clean rows drop the marker column and match [[schema]] exactly; the
    * quarantine side keeps only the raw line so a re-drive job can fix and
    * re-ingest without guessing which fields half-parsed. */
  def quarantine(df: DataFrame): (DataFrame, DataFrame) = (
    df.filter(col(CorruptCol).isNull).drop(CorruptCol),
    df.filter(col(CorruptCol).isNotNull).select(col(CorruptCol).as("raw")))
}
