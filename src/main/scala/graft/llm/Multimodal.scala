package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video as opaque `binary` columns
  * plus a typed metadata struct, with decode/feature-extract implemented as
  * partition-parallel batch functions.
  *
  * The GENERIC decode step is stubbed (this container ships no image/audio
  * codecs — [[decodeStub]]/[[decodePartitions]] derive deterministic fake
  * features from the bytes), but [[decodePpm]] is a REAL dependency-free
  * decoder for one format (binary PPM headers + raster summary), and the
  * Spark-side plumbing is real throughout — which is what matters at
  * 100 TB:
  *   - payloads stay in a `binary` column end-to-end (no base64 strings, no
  *     driver round-trips); parquet stores them page-compressed;
  *   - metadata lives in a typed struct column so filters on width/duration
  *     push down without touching payload bytes (column pruning means a
  *     metadata-only query never reads the blobs);
  *   - per-partition batch processing via `mapPartitions` mirrors the
  *     mapInPandas batch shape: the decode function sees an iterator of rows,
  *     can amortize codec init per partition, and emits rows 1:1 — no
  *     shuffle, scales linearly with partitions.
  */
object Multimodal {

  val mediaMetaType: StructType = StructType(Seq(
    StructField("media_type", StringType),
    StructField("byte_len", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType)))

  /** Wrap a text column as a fake media payload: bytes + typed metadata.
    * Stands in for `spark.read.format("binaryFile")` on real media. */
  def asMedia(df: DataFrame, id: Column, payloadText: Column): DataFrame =
    df.select(
      id.as("doc_id"),
      encode(payloadText, "UTF-8").as("payload"),
      struct(
        lit("image/fake").as("media_type"),
        octet_length(encode(payloadText, "UTF-8")).cast("long").as("byte_len"),
        (octet_length(encode(payloadText, "UTF-8")) % 640).cast("int").as("width"),
        (octet_length(encode(payloadText, "UTF-8")) % 480).cast("int").as("height"),
        (octet_length(encode(payloadText, "UTF-8")) % 24 + 1).cast("int").as("n_frames"))
        .as("meta"))

  /** Column-level stub "decode": deterministic features from bytes. The
    * non-stub version would be a mapPartitions over the payload column with a
    * real codec; the schema contract is this. */
  def decodeStub(payload: Column): Column =
    struct(
      crc32(payload).as("checksum"),
      octet_length(payload).cast("long").as("decoded_bytes"),
      ascii(payload.cast("string")).as("first_byte"))

  case class MediaFeatures(doc_id: Long, checksum: Long, decoded_bytes: Long,
      first_byte: Int)

  /** Partition-parallel decode in the mapInPandas batch shape: iterator in,
    * iterator out, codec state amortized per partition. The ??? -equivalent
    * real decoder is replaced by the same deterministic fake as
    * [[decodeStub]] so tests can pin plumbing without codecs. */
  def decodePartitions(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition "codec init" would happen here
        val crc = new java.util.zip.CRC32()
        it.map { case (id, bytes) =>
          crc.reset(); crc.update(bytes)
          MediaFeatures(id, crc.getValue, bytes.length.toLong,
            if (bytes.nonEmpty) bytes(0) & 0xFF else -1)
        }
      }
      .toDF()
  }

  /** Wrap the text column as a REAL binary PPM (P6) image: header
    * `P6 <w> <h> 255\n` followed by the text bytes as the raster. Unlike
    * [[asMedia]]'s synthetic metadata, this payload is parseable by any
    * PPM reader — it exists so [[decodePpm]] has an actual format to
    * decode and the oracle can pin the parse against the construction
    * arithmetic (w/h derive from the text length; the raster is the text's
    * own bytes, ASCII in the fixture so DuckDB's ord() sees them). */
  def asPpm(df: DataFrame, id: Column, payloadText: Column): DataFrame = {
    // w/h derive from the BYTE length of the encoded raster — decodePpm (and
    // the oracle's strlen) count bytes, so deriving from length() (code
    // points) would silently desynchronize construction and parse on any
    // non-ASCII text
    val rasterBytes = octet_length(encode(payloadText, "UTF-8"))
    val w = (rasterBytes % 64 + 1).cast("long")
    val h = (rasterBytes % 48 + 1).cast("long")
    df.select(
      id.as("doc_id"),
      encode(concat(lit("P6 "), w, lit(" "), h, lit(" 255\n"), payloadText),
        "UTF-8").as("payload"))
  }

  case class PpmFeatures(doc_id: Long, width: Option[Long],
      height: Option[Long], maxval: Option[Long], data_bytes: Option[Long],
      sum_row0: Option[Long])

  /** A REAL dependency-free media decoder (retiring the r11 "declared stub"
    * for one format): parses the binary PPM (P6) header byte-by-byte —
    * magic, whitespace/comment skipping per the Netpbm spec, three ASCII
    * ints, the single raster-separator byte — and summarizes the raster
    * (byte count + sum of the first row's bytes, integer-exact so the
    * oracle restates it). Malformed payloads yield null features, never an
    * exception: a 100 TB media crawl always contains garbage.
    *
    * Same partition-parallel shape as [[decodePartitions]]: mapPartitions,
    * iterator in/out, per-partition state amortized, rows 1:1, no
    * shuffle. */
  def decodePpm(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        parsePpm(bytes) match {
          case Some((w, h, m, db, s0)) =>
            PpmFeatures(id, Some(w), Some(h), Some(m), Some(db), s0)
          case None => PpmFeatures(id, None, None, None, None, None)
        }
      })
      .toDF()
  }

  /** The parser itself — total, allocation-free walk over the bytes.
    * Returns (width, height, maxval, raster_bytes, sum of the first
    * min(3·width, raster_bytes) raster bytes). */
  private[llm] def parsePpm(bytes: Array[Byte]):
      Option[(Long, Long, Long, Long, Option[Long])] = {
    var i = 0
    def isWs(b: Byte): Boolean =
      b == ' ' || b == '\n' || b == '\r' || b == '\t' || b == 11 || b == 12
    def skipWsAndComments(): Unit = {
      var go = true
      while (go && i < bytes.length) {
        if (isWs(bytes(i))) i += 1
        else if (bytes(i) == '#') { // comment runs to end of line
          while (i < bytes.length && bytes(i) != '\n') i += 1
        } else go = false
      }
    }
    def parseInt(): Option[Long] = {
      skipWsAndComments()
      val start = i
      var v = 0L
      while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') {
        v = v * 10 + (bytes(i) - '0'); i += 1
      }
      // > 15 digits would overflow toward garbage (and 3·width must stay
      // in range below) — that's a malformed header, the null-features
      // arm, not a wrapped Long masquerading as a dimension
      if (i == start || i - start > 15) None else Some(v)
    }
    if (bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '6') return None
    i = 2
    for (w <- parseInt(); h <- parseInt(); m <- parseInt()) yield {
      // exactly ONE whitespace byte separates maxval from the raster — a
      // raster beginning with 0x20 is data, not skippable whitespace
      if (i < bytes.length && isWs(bytes(i))) i += 1
      val dataBytes = (bytes.length - i).toLong
      val k = math.min(3L * w, dataBytes).toInt
      val sum0 =
        if (k <= 0) None
        else {
          var s = 0L
          var j = 0
          while (j < k) { s += bytes(i + j) & 0xff; j += 1 }
          Some(s)
        }
      (w, h, m, dataBytes, sum0)
    }
  }

  /** Frame-sampling shape: explode n_frames into (doc_id, frame_idx) rows,
    * every k-th frame — pure generator, no shuffle. */
  def sampleFrames(media: DataFrame, everyK: Int): DataFrame =
    media.select(col("doc_id"),
        explode(sequence(lit(0), col("meta.n_frames") - 1, lit(everyK))).as("frame_idx"))

  /** True 64-bit integer division (Catalyst `IntegralDivide`, SQL `div`) —
    * NOT `floor(a / b)`, whose double division silently loses exactness once
    * `a` leaves the 2^53 range. est_bytes multiplies byte_len by a pixel
    * area, which a large video blob pushes past 2^53 — the cross-engine
    * contract is DuckDB's exact `//`, so the Spark side must be integral all
    * the way. */
  private def longDiv(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(org.apache.spark.sql.catalyst.expressions.IntegralDivide(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** Resize shape: aspect-preserving fit of (width, height) into a target
    * box. The metadata arithmetic is the real, oracle-checkable part (pure
    * 64-bit INTEGER math via [[longDiv]] — exact for ALL long inputs, no
    * float rounding to drift between engines); re-encoding the payload
    * itself is stubbed like [[decodeStub]], with the output size estimated
    * by area ratio. Degenerate dims (the synthetic meta's `byte_len % 640`
    * can be 0) yield NULL resized dims rather than a division by zero. */
  def resizeMeta(media: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    val w = col("meta.width").cast("long")
    val h = col("meta.height").cast("long")
    // limiting side: w·th vs h·tw decides which target edge binds
    val newW = when(w <= 0 || h <= 0, lit(null))
      .when(w * targetH <= h * targetW, longDiv(w * targetH, h))
      .otherwise(lit(targetW.toLong))
    val newH = when(w <= 0 || h <= 0, lit(null))
      .when(w * targetH <= h * targetW, lit(targetH.toLong))
      .otherwise(longDiv(h * targetW, w))
    media.select(col("doc_id"),
      w.as("width"), h.as("height"),
      newW.cast("long").as("new_width"), newH.cast("long").as("new_height"),
      when(w <= 0 || h <= 0, lit(null))
        .otherwise(longDiv(col("meta.byte_len") * newW * newH, w * h))
        .cast("long").as("est_bytes"))
  }
}
