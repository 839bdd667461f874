package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC — the crawl's first-mile container format (ISO 28500; what Common
  * Crawl actually ships). A WARC file is a sequence of records, each a
  * `WARC/1.0` header block (CRLF-separated `Name: value` lines, terminated
  * by a blank line), `Content-Length` octets of payload, and a CRLF CRLF
  * separator. `response` records wrap an HTTP message whose body is the
  * fetched page — the input [[graft.llm.Html.toText]] exists to clean.
  *
  * Parse posture (the [[graft.llm.Multimodal]] byte-walk discipline):
  * a hand-walked, dependency-free parser over the raw bytes — `.warc.gz`
  * segments (the form crawls actually ship: one gzip member per record,
  * members concatenated) are detected by magic and inflated per file
  * under a decompressed-size cap before the walk; any
  * malformation — bad magic, unparsable Content-Length, truncated
  * payload, missing record separator — stops the walk and the REMAINDER
  * of that file quarantines with a reason (never an exception, never a
  * silently-skipped record: a mid-file length lie means nothing after it
  * can be trusted). Records parsed before the corruption are kept.
  *
  * 100 TB shape: parallelism is per FILE — crawls ship thousands of ~1 GB
  * segments and gzip is not splittable, so one-task-per-file IS the
  * industry-standard granule; `binaryFile` gives exactly that (plus
  * pushed path filters), and the walk is one linear pass per file with no
  * allocation beyond the emitted rows. Row width stays bounded by
  * `maxBodyChars` so a hostile 2 GB record cannot balloon an executor. */
object WarcSource {

  /** One parsed record (or one quarantined remainder): when `corrupt` is
    * set every content field is None and the walk of that file stopped. */
  final case class WarcRow(src: String, rec_idx: Int,
      warc_type: Option[String], uri: Option[String],
      http_status: Option[Int], content_type: Option[String],
      x_robots_tag: Option[String], body: Option[String],
      corrupt: Option[String])

  /** Per-record body cap (chars, post-decode) — the MetricsSink row-width
    * doctrine: a single runaway record must not own an executor. The walk
    * also caps the DECODE itself (4·cap bytes covers any UTF-8 body of cap
    * chars plus HTTP framing), so a hostile 2 GB record never materializes
    * as a full String before truncation; the record boundary still
    * advances by the declared Content-Length, so subsequent records parse
    * normally. */
  val MaxBodyChars: Int = 4 * 1024 * 1024

  /** Per-file decompressed-size cap for `.warc.gz` input — the gzip-bomb
    * posture: a crawl segment is ~1 GB compressed / ~4-5 GB raw, so 1 GiB
    * of decompressed bytes per local-mode file is a config ceiling, not a
    * data ceiling (a real cluster shards by file anyway). Past the cap the
    * already-inflated prefix still parses; the remainder quarantines. */
  val MaxGunzipBytes: Int = 1 << 30

  private val Crlf2 = "\r\n\r\n".getBytes("US-ASCII")

  private def looksGzip(b: Array[Byte]): Boolean =
    b.length >= 2 && (b(0) & 0xff) == 0x1f && (b(1) & 0xff) == 0x8b

  /** Bounded multi-member gunzip. Common Crawl writes each WARC record as
    * its own gzip member and concatenates them (that is what makes
    * per-record random access possible server-side); `GZIPInputStream`
    * walks concatenated members natively. Returns the inflated bytes plus
    * an optional quarantine reason: the cap tripping (inflation stops AT
    * the cap — a bomb never materializes) or a corrupt member (the prefix
    * inflated before the corruption is kept, per the walk discipline). */
  private[sources] def gunzip(bytes: Array[Byte],
      cap: Int = MaxGunzipBytes): (Array[Byte], Option[String]) = {
    val out = new java.io.ByteArrayOutputStream(
      math.min(math.max(bytes.length.toLong * 4, 64 * 1024L), cap.toLong).toInt)
    var reason: Option[String] = None
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes), 64 * 1024)
      try {
        val buf = new Array[Byte](64 * 1024)
        var n = in.read(buf)
        while (n >= 0 && reason.isEmpty) {
          val room = cap - out.size
          if (n > room) {
            out.write(buf, 0, room)
            reason = Some(s"gzip expansion over $cap-byte cap")
          } else {
            out.write(buf, 0, n)
            n = in.read(buf)
          }
        }
      } finally in.close()
    } catch {
      // constructor = bad header right after the magic; mid-stream = a
      // corrupt member or trailer — either way keep what inflated
      case e: java.io.IOException =>
        reason = Some(s"corrupt gzip stream (${e.getMessage}) " +
          s"after ${out.size} inflated bytes")
    }
    (out.toByteArray, reason)
  }

  private def indexOf(hay: Array[Byte], needle: Array[Byte], from: Int): Int = {
    var i = math.max(from, 0)
    val last = hay.length - needle.length
    while (i <= last) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }

  /** Walk one file's bytes into records + an optional corrupt remainder.
    * Detects the gzip magic first and inflates (bounded) — a `.warc.gz`
    * crawl segment and a plain `.warc` file parse identically past this
    * point. `maxBodyChars` is a test seam; production callers take the
    * default. */
  private[sources] def walk(src: String, bytes: Array[Byte],
      maxBodyChars: Int = MaxBodyChars): Seq[WarcRow] = {
    if (looksGzip(bytes)) {
      val (plain, gzReason) = gunzip(bytes)
      val rows = walk(src, plain, maxBodyChars)
      return gzReason.fold(rows) { r =>
        // drop the walk's own tail-truncation row (the cap/corruption cut
        // mid-record, and the gzip reason names the real cause), then
        // quarantine the remainder under that reason
        val parsed = rows.takeWhile(_.corrupt.isEmpty)
        parsed :+ WarcRow(src, parsed.size, None, None, None, None, None,
          None, Some(r))
      }
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[WarcRow]
    var pos = 0
    var idx = 0
    def corrupt(reason: String): Unit =
      out += WarcRow(src, idx, None, None, None, None, None, None,
        Some(s"$reason at offset $pos"))
    var stop = false
    while (!stop && pos < bytes.length) {
      // lenient: skip stray CRLFs between records
      while (pos + 1 < bytes.length && bytes(pos) == '\r' && bytes(pos + 1) == '\n')
        pos += 2
      if (pos >= bytes.length) stop = true
      else {
        val hdrEnd = indexOf(bytes, Crlf2, pos)
        if (hdrEnd < 0) { corrupt("unterminated header block"); stop = true }
        else {
          val hdr = new String(bytes, pos, hdrEnd - pos, "US-ASCII")
          val lines = hdr.split("\r\n", -1)
          if (!lines.head.startsWith("WARC/")) {
            corrupt("bad record magic"); stop = true
          } else {
            def header(name: String): Option[String] = lines.tail
              .find(_.toLowerCase.startsWith(name.toLowerCase + ":"))
              .map(l => l.substring(l.indexOf(':') + 1).trim)
            header("Content-Length").flatMap(_.toLongOption) match {
              case None => corrupt("missing or non-numeric Content-Length"); stop = true
              case Some(len) =>
                val payloadStart = hdrEnd + 4
                if (len < 0 || payloadStart + len > bytes.length) {
                  corrupt("truncated payload"); stop = true
                } else {
                  val pEnd = payloadStart + len.toInt
                  // the record separator is mandatory unless the record
                  // ends the file exactly
                  val sepOk = pEnd == bytes.length ||
                    indexOf(bytes, Crlf2, pEnd) == pEnd
                  if (!sepOk) { corrupt("missing record separator"); stop = true }
                  else {
                    val wtype = header("WARC-Type")
                    // bounded decode: never materialize more than the body
                    // cap can keep (4 bytes/char worst case + HTTP framing
                    // headroom); the walk still advances by the full
                    // declared length below
                    val decLen = math.min(len,
                      maxBodyChars.toLong * 4 + 8192).toInt
                    val payload =
                      new String(bytes, payloadStart, decLen, "UTF-8")
                    // response records wrap an HTTP message: status line,
                    // headers (Content-Type and X-Robots-Tag surfaced raw —
                    // the filter/gate, not the parser, normalizes them),
                    // blank line, body
                    val (status, ctype, xrobots, body) =
                      if (wtype.contains("response") &&
                          payload.startsWith("HTTP/")) {
                        val cut = payload.indexOf("\r\n\r\n")
                        val head =
                          if (cut < 0) payload else payload.substring(0, cut)
                        val st = payload.linesIterator.nextOption()
                          .flatMap(_.split(" ").lift(1)).flatMap(_.toIntOption)
                        val hs = head.split("\r\n", -1).drop(1)
                        def httpHeader(name: String): Option[String] = hs
                          .find(_.toLowerCase.startsWith(name + ":"))
                          .map(l => l.substring(l.indexOf(':') + 1).trim)
                        val b = if (cut < 0) "" else payload.substring(cut + 4)
                        (st, httpHeader("content-type"),
                          httpHeader("x-robots-tag"), b)
                      } else (None, None, None, payload)
                    out += WarcRow(src, idx, wtype, header("WARC-Target-URI"),
                      status, ctype, xrobots, Some(body.take(maxBodyChars)), None)
                    idx += 1
                    pos = pEnd
                  }
                }
            }
          }
        }
      }
    }
    out.toSeq
  }

  /** Parse a (src string, content binary) frame of whole WARC files into
    * record rows — the shared core of [[warc]] and the fixture queries
    * (which synthesize their streams in-plan). */
  def parseWarc(streams: DataFrame): DataFrame = {
    val spark = streams.sparkSession
    import spark.implicits._
    streams.select(col("src").cast("string"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (src, bytes) => walk(src, bytes) })
      .toDF()
  }

  /** Read a directory/glob of WARC files: one task per file (the gzip
    * granule), records + quarantined remainders as rows. */
  def warc(spark: SparkSession, path: String): DataFrame =
    parseWarc(spark.read.format("binaryFile").load(path)
      .select(col("path").as("src"), col("content")))

  /** Streaming twin of [[warc]] — tail a crawl landing zone of WARC
    * segments as fetchers drop them ([[DocumentSource.jsonlStream]]'s
    * lifecycle contract: `maxFilesPerTrigger` bounds a micro-batch so one
    * big drop can't stall the cadence, `cleanSource` keeps the listing
    * from becoming the bottleneck at sustained crawl volume, the
    * checkpoint keeps exactly-once). The parse is the same stateless
    * per-file byte-walk, so [[quarantine]] and the downstream
    * clean/dedup/stamp chain compose unchanged on the stream. */
  def warcStream(spark: SparkSession, path: String,
      maxFilesPerTrigger: Int = 4,
      cleanSource: String = "off",
      archiveDir: Option[String] = None): DataFrame = {
    // binaryFile's fixed schema, pinned explicitly — streaming file
    // sources refuse to infer (the DocumentSource explicit-schema rule
    // applies doubly here: inference would stat every existing segment)
    val binarySchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("path",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("modificationTime",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("length",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("content",
        org.apache.spark.sql.types.BinaryType)))
    val base = spark.readStream.format("binaryFile")
      .schema(binarySchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .option("cleanSource", cleanSource)
    parseWarc(
      archiveDir.foldLeft(base)((b, d) => b.option("sourceArchiveDir", d))
        .load(path)
        .select(col("path").as("src"), col("content")))
  }

  /** Split parsed records into (clean rows, quarantined remainders) —
    * the [[DocumentSource.quarantine]] contract for the WARC side. */
  def quarantine(df: DataFrame): (DataFrame, DataFrame) = (
    df.filter(col("corrupt").isNull).drop("corrupt"),
    df.filter(col("corrupt").isNotNull)
      .select(col("src"), col("rec_idx"), col("corrupt").as("reason")))

  /** First-mile HTTP response gate — the filter every crawl curation runs
    * BEFORE any text parse: keep WARC-Type=response records that answered
    * HTTP 200 with a media type in `okTypes` (the Content-Type parameter
    * before any ';', lowercased and trimmed — `TEXT/HTML; charset=UTF-8`
    * passes a `text/html` allowlist). Everything is a codegen'd predicate
    * over the parsed frame: no UDF, no shuffle, and the normalized
    * `media_type` column rides along for per-type routing downstream.
    * Corrupt remainders are excluded here too, so the gate composes with
    * or without a prior [[quarantine]] split. */
  def responseFilter(parsed: DataFrame,
      okTypes: Seq[String] = Seq("text/html", "text/plain")): DataFrame = {
    val media = trim(element_at(split(lower(col("content_type")), ";"), 1))
    val notCorrupt = // quarantine's clean side has already dropped the column
      if (parsed.columns.contains("corrupt")) col("corrupt").isNull else lit(true)
    parsed.filter(notCorrupt &&
        col("warc_type") === "response" &&
        col("http_status") === 200 &&
        media.isin(okTypes: _*))
      .withColumn("media_type", media)
  }
}
