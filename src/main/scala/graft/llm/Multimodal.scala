package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video as opaque `binary` columns
  * plus a typed metadata struct, with decode/feature-extract implemented as
  * partition-parallel batch functions.
  *
  * Decode is REAL for every format this container can honestly ship a
  * decoder for: [[decodePpm]] (binary PPM headers + raster summary),
  * [[parseWav]] (RIFF/WAVE chunk walk + PCM sample summary), and
  * [[parsePng]] (chunk CRCs + zlib INFLATE + scanline defilter — the first
  * COMPRESSED format) are total, fuzz-pinned byte-level parsers, and
  * [[decodeMedia]] dispatches on the magic bytes — PPM/WAV/PNG route to
  * their parsers, anything else yields null features (a 100 TB media crawl
  * always contains garbage). The r11/r12 "fake features" stub family
  * (crc32-as-decode) is gone. The Spark-side
  * plumbing is what matters at 100 TB:
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

  /** First-k-sample window summarized by the WAV/dispatch parsers (and
    * restated by the oracles as a sum over the leading text bytes). */
  val WavSumK = 48

  /** Deterministic audio parameters derived from a payload's byte length —
    * the construction arithmetic [[wavBytes]] embeds and the oracles
    * restate (mono/stereo alternates, sample rate walks 8000..15999). */
  private[llm] def wavChannels(n: Long): Int = (n % 2 + 1).toInt
  private[llm] def wavSampleRate(n: Long): Int = (8000 + n % 8000).toInt

  /** A REAL little-endian RIFF/WAVE (PCM, 8-bit) container around `data` as
    * the sample stream: RIFF header, canonical 16-byte fmt chunk, data
    * chunk (odd sizes carry the RIFF pad byte). Parseable by any WAV
    * reader; parameters derive from the data length so the oracle can pin
    * the parse against the construction. */
  private[llm] def wavBytes(data: Array[Byte],
      extraChunk: Boolean = false): Array[Byte] = {
    val channels = wavChannels(data.length.toLong)
    val rate = wavSampleRate(data.length.toLong)
    val blockAlign = channels // 8-bit mono/stereo: one byte per channel
    val byteRate = rate * blockAlign
    val pad = data.length % 2 // RIFF chunks are word-aligned
    // optional junk metadata chunk (a LIST/INFO stub) between fmt and
    // data — the container re-encode every tag editor produces: same
    // samples, different bytes. Every RIFF reader must skip it.
    val junk = if (extraChunk) 8 + 8 else 0
    val riffSize = 4 + 24 + junk + 8 + data.length + pad
    val out = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(riffSize)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort) // PCM
      .putShort(channels.toShort).putInt(rate).putInt(byteRate)
      .putShort(blockAlign.toShort).putShort(8.toShort) // 8 bits/sample
    if (extraChunk)
      out.put("LIST".getBytes("US-ASCII")).putInt(8)
        .put("INFOgnft".getBytes("US-ASCII"))
    out.put("data".getBytes("US-ASCII")).putInt(data.length).put(data)
    if (pad == 1) out.put(0.toByte)
    out.array()
  }

  /** Wrap the text column as a REAL playable WAV: the UTF-8 bytes become
    * the 8-bit PCM sample stream. The [[asPpm]] pattern for audio — exists
    * so [[parseWav]] has an actual format to decode and the oracle can pin
    * the parse against the construction arithmetic. */
  def asWav(df: DataFrame, id: Column, payloadText: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(id.cast("long").as("doc_id"), payloadText.cast("string").as("t"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (i, t) =>
        (i, wavBytes(Option(t).getOrElse("").getBytes("UTF-8")))
      })
      .toDF("doc_id", "payload")
  }

  case class WavFeatures(doc_id: Long, channels: Option[Long],
      sample_rate: Option[Long], bits: Option[Long], data_bytes: Option[Long],
      n_samples: Option[Long], sum0: Option[Long])

  /** RIFF/WAVE parser — total, allocation-light walk over the bytes: RIFF
    * magic + WAVE form type, then the chunk list (word-aligned sizes, like
    * every RIFF reader must handle), requiring one canonical PCM fmt chunk
    * BEFORE the data chunk. Malformed or truncated payloads (or non-PCM /
    * non-8-bit encodings this parser doesn't implement) yield None, never
    * an exception. Returns (channels, sampleRate, bits, dataBytes,
    * nSamples = dataBytes/blockAlign, sum of first min([[WavSumK]],
    * dataBytes) unsigned sample bytes — None when the stream is empty). */
  /** Shared RIFF chunk walk under [[parseWav]] and [[wavEnvelopeHash]]:
    * RIFF magic + WAVE form type, then the word-aligned chunk list (every
    * RIFF reader skips unknown chunks — that is WHY a metadata re-encode
    * never changes the decoded samples), requiring one canonical PCM-8
    * fmt chunk BEFORE data. Returns (channels, rate, blockAlign, bits,
    * dataStart, dataBytes) or None for anything malformed / unsupported. */
  private def wavPcmData(bytes: Array[Byte]):
      Option[(Int, Long, Int, Int, Int, Int)] = {
    def le16(i: Int): Int = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8)
    def le32(i: Int): Long =
      (bytes(i) & 0xffL) | ((bytes(i + 1) & 0xffL) << 8) |
        ((bytes(i + 2) & 0xffL) << 16) | ((bytes(i + 3) & 0xffL) << 24)
    def tag(i: Int): String =
      new String(bytes, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (bytes.length < 12 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var i = 12
    var fmt: Option[(Int, Long, Int, Int)] = None // channels, rate, align, bits
    while (i + 8 <= bytes.length) {
      val id = tag(i)
      val size = le32(i + 4)
      val body = i + 8
      // a declared size past the buffer is a truncated/garbage file
      if (size < 0 || body + size > bytes.length) return None
      if (id == "fmt ") {
        if (size < 16) return None
        val audioFormat = le16(body)
        val channels = le16(body + 2)
        val rate = le32(body + 4)
        val blockAlign = le16(body + 12)
        val bits = le16(body + 14)
        // only canonical PCM-8 is implemented; anything else is "a format
        // this decoder doesn't speak" = null features, same as garbage
        if (audioFormat != 1 || bits != 8 || channels < 1 ||
          blockAlign != channels) return None
        fmt = Some((channels, rate, blockAlign, bits))
      } else if (id == "data") {
        val (channels, rate, blockAlign, bits) =
          fmt.getOrElse(return None) // fmt must precede data
        return Some((channels, rate, blockAlign, bits, body, size.toInt))
      }
      i = body + size.toInt + (size % 2).toInt // word alignment pad
    }
    None // no data chunk
  }

  private[llm] def parseWav(bytes: Array[Byte]):
      Option[(Long, Long, Long, Long, Long, Option[Long])] =
    wavPcmData(bytes).map {
      case (channels, rate, blockAlign, bits, body, dataBytes) =>
        val k = math.min(WavSumK.toLong, dataBytes.toLong).toInt
        val sum0 =
          if (k <= 0) None
          else {
            var s = 0L
            var j = 0
            while (j < k) { s += bytes(body + j) & 0xff; j += 1 }
            Some(s)
          }
        (channels.toLong, rate, bits.toLong, dataBytes.toLong,
          dataBytes.toLong / blockAlign, sum0)
    }

  /** Envelope dHash-64 for audio — [[ppmDHash]]'s sibling over the PCM
    * byte stream: 65 time-normalized frames (byte i → frame i·65 div n),
    * per-frame energy Σ|b−128| (8-bit PCM's unsigned midpoint), bit f set
    * iff e(f+1) > e(f). Integer-only and engine-portable.
    *
    * Invariant by construction under the transforms that defeat byte-
    * exact dedup while keeping the signal: container re-encodes (chunk
    * layout/metadata — the walk skips them before the hash ever sees a
    * byte) and polarity inversion (|(256−b)%256 − 128| = |b−128| for all
    * b). NOT invariant under resampling: a duration change moves the
    * integer frame boundaries (the image dHash's floor identity needs
    * 2-D dims-addressed sampling, which a 1-D interleaved stream lacks);
    * a production audio fingerprint time-normalizes with overlapping
    * spectral windows — out of scope without codecs. */
  private[llm] def wavEnvelopeHash(bytes: Array[Byte]): Option[Long] =
    wavPcmData(bytes).map { case (_, _, _, _, start, n) =>
      val e = new Array[Long](65)
      var i = 0
      while (i < n) {
        e((i.toLong * 65 / n).toInt) += math.abs((bytes(start + i) & 0xff) - 128)
        i += 1
      }
      var hsh = 0L
      var f = 0
      while (f < 64) {
        if (e(f + 1) > e(f)) hsh |= 1L << f
        f += 1
      }
      hsh
    }

  /** Per-clip perceptual hash: (doc_id, payload) → (doc_id, dhash) — the
    * [[dHashPpm]] shape for audio; feeds [[dHashPairs]] unchanged. */
  def envelopeHashWav(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        PHash(id, wavEnvelopeHash(bytes))
      })
      .toDF()
  }

  /** [[asWav]] with a junk LIST/INFO chunk between fmt and data — the
    * metadata re-encode plant: same samples, different container bytes. */
  def asWavReencoded(df: DataFrame, id: Column, payloadText: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(id.cast("long").as("doc_id"), payloadText.cast("string").as("t"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (i, t) =>
        (i, wavBytes(Option(t).getOrElse("").getBytes("UTF-8"),
          extraChunk = true))
      })
      .toDF("doc_id", "payload")
  }

  /** [[asWav]] over the polarity-inverted sample stream (b → (256−b) mod
    * 256) — the phase flip that changes every data byte but no energy. */
  def asWavInverted(df: DataFrame, id: Column, payloadText: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(id.cast("long").as("doc_id"), payloadText.cast("string").as("t"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (i, t) =>
        (i, wavBytes(Option(t).getOrElse("").getBytes("UTF-8")
          .map(b => ((256 - (b & 0xff)) % 256).toByte)))
      })
      .toDF("doc_id", "payload")
  }

  /** Partition-parallel WAV decode — same mapPartitions batch shape as
    * [[decodePpm]]: iterator in/out, rows 1:1, no shuffle. */
  def decodeWav(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        parseWav(bytes) match {
          case Some((c, r, b, db, ns, s0)) =>
            WavFeatures(id, Some(c), Some(r), Some(b), Some(db), Some(ns), s0)
          case None => WavFeatures(id, None, None, None, None, None, None)
        }
      })
      .toDF()
  }

  /** Scala twin of [[asPpm]]'s construction arithmetic (same header, same
    * byte-length-derived dimensions) for builders that assemble payloads in
    * a mapPartitions pass. */
  private[llm] def ppmBytes(data: Array[Byte]): Array[Byte] = {
    val w = data.length % 64 + 1
    val h = data.length % 48 + 1
    s"P6 $w $h 255\n".getBytes("US-ASCII") ++ data
  }

  /** Mixed-format corpus in ONE constructor pass (one scan — the
    * per-format-arm union would read the table once per format): doc_id % 4
    * routes to a real PPM, a real WAV, a real PNG, or a deliberately-
    * unrecognizable payload (sentinel 0x3F '?' prefix — NOT a magic byte
    * of any implemented format, so the dispatch outcome is deterministic
    * for arbitrary corpus text, including text that happens to start with
    * "P6" or "RIFF"). */
  def asMixedMedia(df: DataFrame, id: Column, payloadText: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(id.cast("long").as("doc_id"), payloadText.cast("string").as("t"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (i, t) =>
        val data = Option(t).getOrElse("").getBytes("UTF-8")
        val payload = (((i % 4) + 4) % 4) match {
          case 0 => ppmBytes(data)
          case 1 => wavBytes(data)
          case 2 => pngBytes(data)
          case _ => '?'.toByte +: data
        }
        (i, payload)
      })
      .toDF("doc_id", "payload")
  }

  case class MediaDecoded(doc_id: Long, format: Option[String],
      width: Option[Long], height: Option[Long],
      channels: Option[Long], sample_rate: Option[Long],
      data_bytes: Option[Long], sum0: Option[Long])

  /** Format dispatch — THE generic decode entry: sniff the magic bytes,
    * route PPM/WAV to their real parsers, emit null features (format null)
    * for anything else. One mapPartitions pass, rows 1:1; per-format
    * feature columns are null outside their format, data_bytes/sum0 are the
    * cross-format summary pair (PPM: raster bytes + first-row sum; WAV:
    * sample bytes + first-[[WavSumK]] sum). */
  def decodeMedia(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        if (bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6')
          parsePpm(bytes) match {
            case Some((w, h, _, db, s0)) =>
              MediaDecoded(id, Some("ppm"), Some(w), Some(h), None, None,
                Some(db), s0)
            case None =>
              MediaDecoded(id, None, None, None, None, None, None, None)
          }
        else if (bytes.length >= 12 && bytes(0) == 'R' && bytes(1) == 'I' &&
          bytes(2) == 'F' && bytes(3) == 'F')
          parseWav(bytes) match {
            case Some((c, r, _, db, _, s0)) =>
              MediaDecoded(id, Some("wav"), None, None, Some(c), Some(r),
                Some(db), s0)
            case None =>
              MediaDecoded(id, None, None, None, None, None, None, None)
          }
        else if (bytes.length >= 8 && bytes(0) == PngSig(0) &&
          bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G')
          parsePng(bytes) match {
            case Some((w, h, c, db, s0)) =>
              MediaDecoded(id, Some("png"), Some(w), Some(h), Some(c), None,
                Some(db), s0)
            case None =>
              MediaDecoded(id, None, None, None, None, None, None, None)
          }
        else MediaDecoded(id, None, None, None, None, None, None, None)
      })
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
    * Same partition-parallel shape as [[decodeMedia]]: mapPartitions,
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

  /** Shared header walk: magic + three ASCII ints per the Netpbm spec
    * (whitespace/comment skipping, the single raster-separator byte).
    * Returns (width, height, maxval, raster start offset) or None on any
    * malformation. */
  private[llm] def parsePpmHeader(bytes: Array[Byte]):
      Option[(Long, Long, Long, Int)] = {
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
      (w, h, m, i)
    }
  }

  /** The parser itself — total, allocation-free walk over the bytes.
    * Returns (width, height, maxval, raster_bytes, sum of the first
    * min(3·width, raster_bytes) raster bytes). */
  private[llm] def parsePpm(bytes: Array[Byte]):
      Option[(Long, Long, Long, Long, Option[Long])] = {
    parsePpmHeader(bytes).map { case (w, h, m, start) =>
      val dataBytes = (bytes.length - start).toLong
      val k = math.min(3L * w, dataBytes).toInt
      val sum0 =
        if (k <= 0) None
        else {
          var s = 0L
          var j = 0
          while (j < k) { s += bytes(start + j) & 0xff; j += 1 }
          Some(s)
        }
      (w, h, m, dataBytes, sum0)
    }
  }

  /** dHash-64 (difference hash) over a decoded P6 raster — the perceptual
    * fingerprint that makes image dedup survive re-encoding: a header
    * rewrite, a comment, or a nearest-neighbor resize leaves the sampled
    * luminance grid (and therefore every difference bit) unchanged, while
    * byte-exact dedup sees a different blob.
    *
    * Integer-only, engine-portable recipe (restated verbatim by the
    * DuckDB oracle):
    *   - 9×8 nearest-neighbor sample grid: pixel (x·w div 9, y·h div 8)
    *     for x∈[0,9), y∈[0,8) — integer division, so a 2× upscaled raster
    *     samples EXACTLY the original pixels (floor(floor(2xw/9)/2) =
    *     floor(xw/9));
    *   - luminance = r+g+b (monotone in any fixed-weight gray transform,
    *     and exact — difference bits only need the ORDER);
    *   - bit y·8+x set iff gray(x+1, y) > gray(x, y) (9 columns → 8
    *     differences per row);
    *   - raster bytes beyond the payload read 0 (the PNG zero-padding
    *     convention — a truncated image still hashes deterministically).
    * Dimensions above 2^20 are rejected as hostile headers (the offset
    * product must stay in Long). */
  private[llm] def ppmDHash(bytes: Array[Byte]): Option[Long] =
    parsePpmHeader(bytes).flatMap { case (w, h, _, start) =>
      if (w <= 0 || h <= 0 || w > (1L << 20) || h > (1L << 20)) None
      else {
        val n = bytes.length
        def gray(sx: Long, sy: Long): Int = {
          val off = start + 3L * (sy * w + sx)
          var g = 0
          var c = 0
          while (c < 3) {
            val p = off + c
            if (p < n) g += bytes(p.toInt) & 0xff
            c += 1
          }
          g
        }
        val gs = Array.tabulate(8, 9)((y, x) => gray(x * w / 9, y * h / 8))
        var hsh = 0L
        var b = 0
        while (b < 64) {
          val x = b % 8
          val y = b / 8
          if (gs(y)(x + 1) > gs(y)(x)) hsh |= 1L << b
          b += 1
        }
        Some(hsh)
      }
    }

  case class PHash(doc_id: Long, dhash: Option[Long])

  /** Per-image perceptual hash: (doc_id, payload) → (doc_id, dhash).
    * Same partition-parallel shape as [[decodePpm]] — mapPartitions, rows
    * 1:1, no shuffle; malformed payloads yield null, never an exception. */
  def dHashPpm(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => PHash(id, ppmDHash(bytes)) })
      .toDF()
  }

  /** Perceptual near-dup candidate pairs: hamming distance ≤ `maxDist`
    * over the dHash via 16-bit-chunk banding — [[Dedup.simHashPairs]]'s
    * exact discipline (4 chunks; dist ≤ 3 ⇒ some chunk equal by
    * pigeonhole), including the pair-preserving hot-bucket salt guard, so
    * a meme re-shared a million times never puts one bucket's quadratic
    * through a single task. Input: [[dHashPpm]] output; null hashes
    * (undecodable blobs) drop out before banding. */
  /** 4 × 16-bit chunk banding rows for a (doc_id, dhash) frame — the
    * shared candidate key of [[dHashPairs]] and [[dHashDedupApply]]. */
  private def dHashBanded(hashed: DataFrame): DataFrame =
    hashed.filter(col("dhash").isNotNull)
      .select(col("doc_id"), col("dhash"),
        explode(array((0 until 4).map(c =>
          struct(lit(c).as("chunk"),
            shiftright(col("dhash"), c * 16).bitwiseAND(0xFFFFL).as("key"))): _*))
          .as("ck"))
      .select(col("doc_id"), col("dhash").as("sig"),
        col("ck.chunk").as("band"), col("ck.key").as("key"))

  def dHashPairs(hashed: DataFrame, maxDist: Int,
      bucketCap: Int = Dedup.DefaultBandBucketCap): DataFrame = {
    // id-only pairs through the chunk join + dropDuplicates, hashes joined
    // back per surviving pair (the r19 saltedBandPairs contract — see
    // Dedup.simHashPairs). `hashed` is usually a LAZY decode product
    // (dHashPpm / envelopeHashWav), so the 16-byte (doc_id, dhash) relation
    // is persisted here — banding and both join-backs read the cache, and
    // the payload bytes decode exactly once (CacheHygiene releases it).
    val keyed = hashed.filter(col("dhash").isNotNull)
      .select(col("doc_id"), col("dhash"))
      .persist()
    val banded = dHashBanded(keyed)
      .select(col("doc_id"), col("band"), col("key"))
    val cand =
      if (bucketCap == Int.MaxValue)
        banded.as("a").hint("shuffle_merge")
          .join(banded.as("b").hint("shuffle_merge"),
            col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
              col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      else Dedup.saltedBandPairs(banded, bucketCap)
    cand.dropDuplicates("id_a", "id_b")
      .join(keyed.select(col("doc_id").as("id_a"), col("dhash").as("sig_a")), "id_a")
      .join(keyed.select(col("doc_id").as("id_b"), col("dhash").as("sig_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
      .filter(col("hamming") <= maxDist)
  }

  /** Perceptual near-dup APPLY — the production form of [[dHashPairs]]:
    * drop every image whose hash lies within `maxDist` of a LOWER-ID
    * image sharing a band key; keep the rest. "List all pairs" output is
    * quadratic in a clustered corpus by definition (a meme re-shared m
    * times is m(m−1)/2 pairs — the r18-close 10x breach), so the pairs
    * form retires to verify-only oracle instrument and THIS is what the
    * bench measures: survivors are linear, and the anchor cap (the
    * [[Similarity.semDeDupSurvivors]] stage-b discipline) bounds the work
    * per band bucket at n·cap — each image compares only against the cap
    * lowest-id members of its buckets. Recall against a lower-id partner
    * outside the anchor set is traded away explicitly; a dense cluster is
    * exactly what the anchors still catch.
    *
    * Skew posture: anchors come from a two-phase salted top-k (no task
    * ever sorts a whole hot bucket — the topKPerGroup doctrine), and the
    * loser join salts the b-side (anchors, ≤cap per bucket, replicate to
    * every salt; result set unchanged) so the hottest bucket spreads over
    * nSalts tasks. */
  def dHashDedupApply(hashed: DataFrame, maxDist: Int,
      anchorCap: Int = 64, nSalts: Int = 32): DataFrame = {
    val banded = dHashBanded(hashed)
    val salt = pmod(Sampling.scrambleKey(col("doc_id")), lit(nSalts.toLong))
    val anchors = banded
      .withColumn("rk1", row_number().over(
        Window.partitionBy(col("band"), col("key"), salt).orderBy(col("doc_id"))))
      .filter(col("rk1") <= anchorCap)
      .withColumn("rk2", row_number().over(
        Window.partitionBy(col("band"), col("key")).orderBy(col("doc_id"))))
      .filter(col("rk2") <= anchorCap)
      .select(col("doc_id"), col("sig"), col("band"), col("key"),
        explode(array((0 until nSalts).map(s => lit(s.toLong)): _*)).as("slt"))
    val bSide = banded.withColumn("slt", salt)
    val losers = anchors.as("a")
      .join(bSide.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.slt") === col("b.slt") && col("a.doc_id") < col("b.doc_id"))
      .filter(bit_count(col("a.sig").bitwiseXOR(col("b.sig"))) <= maxDist)
      .select(col("b.doc_id").as("loser")).distinct()
    hashed.join(losers, hashed("doc_id") === losers("loser"), "left_anti")
  }

  private val PngSig: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private[llm] def pngWidth(n: Long): Int = (n % 64 + 1).toInt
  private[llm] def pngHeight(n: Long): Int = {
    val w = pngWidth(n)
    math.max(((n + w - 1) / w).toInt, 1)
  }

  /** Assemble a PNG from already-FILTERED scanlines (each row = 1 filter
    * byte + stride bytes): signature, IHDR (8-bit, colorType 0 grayscale or
    * 2 RGB), one zlib-deflated IDAT, IEND — CRC32 per chunk, as any PNG
    * reader requires. Split from [[pngBytes]] so specs can hand-craft
    * payloads exercising filter types 1–4, which the canonical constructor
    * (filter 0) never emits. */
  private[llm] def pngEncode(w: Int, h: Int, colorType: Int,
      scanlines: Array[Byte]): Array[Byte] = {
    val crc = new java.util.zip.CRC32
    def be32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def chunk(tpe: String, payload: Array[Byte]): Array[Byte] = {
      val t = tpe.getBytes("US-ASCII")
      crc.reset(); crc.update(t); crc.update(payload)
      be32(payload.length.toLong) ++ t ++ payload ++ be32(crc.getValue)
    }
    val ihdr = be32(w.toLong) ++ be32(h.toLong) ++
      Array[Byte](8, colorType.toByte, 0, 0, 0)
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(scanlines)
    deflater.finish()
    val out = new java.io.ByteArrayOutputStream(scanlines.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) out.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    PngSig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", out.toByteArray) ++
      chunk("IEND", Array.emptyByteArray)
  }

  /** Wrap `data` as a REAL 8-bit grayscale PNG: width from the byte length
    * (same fold as [[ppmBytes]]), height = ⌈n/w⌉ (≥ 1), raster zero-padded
    * to w·h, filter 0 per scanline, zlib IDAT. Parseable by any PNG reader;
    * parameters derive from the data length so the oracle pins the parse
    * against the construction arithmetic — the DEFLATE round-trip is the
    * engine-side reality the spec pins. */
  private[llm] def pngBytes(data: Array[Byte]): Array[Byte] = {
    val w = pngWidth(data.length.toLong)
    val h = pngHeight(data.length.toLong)
    val raster = java.util.Arrays.copyOf(data, w * h) // zero-padded tail
    val scan = new Array[Byte]((w + 1) * h)
    var r = 0
    while (r < h) {
      scan(r * (w + 1)) = 0 // filter: None
      System.arraycopy(raster, r * w, scan, r * (w + 1) + 1, w)
      r += 1
    }
    pngEncode(w, h, 0, scan)
  }

  /** Wrap the text column as a REAL grayscale PNG — the [[asPpm]]/[[asWav]]
    * pattern for a COMPRESSED image format. */
  def asPng(df: DataFrame, id: Column, payloadText: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(id.cast("long").as("doc_id"), payloadText.cast("string").as("t"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (i, t) =>
        (i, pngBytes(Option(t).getOrElse("").getBytes("UTF-8")))
      })
      .toDF("doc_id", "payload")
  }

  case class PngFeatures(doc_id: Long, width: Option[Long],
      height: Option[Long], channels: Option[Long], data_bytes: Option[Long],
      sum_row0: Option[Long])

  /** PNG decode — same partition-parallel shape as [[decodePpm]]. */
  def decodePng(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        parsePng(bytes) match {
          case Some((w, h, c, db, s0)) =>
            PngFeatures(id, Some(w), Some(h), Some(c), Some(db), s0)
          case None => PngFeatures(id, None, None, None, None, None)
        }
      })
      .toDF()
  }

  /** A REAL dependency-free PNG decoder — the first COMPRESSED format in
    * the dispatch family (PPM and WAV are containered raw bytes; a PNG
    * payload has to survive chunk CRCs, zlib INFLATE, and scanline
    * defiltering before any feature is trustworthy). Implements the honest
    * static subset a feature extractor needs: 8-bit greyscale (colorType
    * 0) and truecolor (2), non-interlaced, all five standard scanline
    * filters (None/Sub/Up/Average/Paeth) — anything else (palette, 16-bit,
    * interlace, bad CRC, truncated or over-long IDAT) yields None, never an
    * exception or a junk feature row.
    *
    * Returns (width, height, channels, raster_bytes = w·channels·h, sum of
    * the first DEFILTERED scanline's unsigned bytes). Decompressed size is
    * bounded up front by the IHDR dimensions (w·h capped), so a hostile
    * deflate bomb cannot balloon memory — the parser allocates exactly the
    * raster it validated. */
  private[llm] def parsePng(bytes: Array[Byte]):
      Option[(Long, Long, Long, Long, Option[Long])] = {
    try {
      if (bytes.length < 8) return None
      var i = 0
      while (i < 8) { if (bytes(i) != PngSig(i)) return None; i += 1 }
      def be32(o: Int): Long =
        ((bytes(o) & 0xffL) << 24) | ((bytes(o + 1) & 0xffL) << 16) |
          ((bytes(o + 2) & 0xffL) << 8) | (bytes(o + 3) & 0xffL)
      var pos = 8
      var w = 0L
      var h = 0L
      var channels = 0
      var seenIhdr = false
      var seenIend = false
      val idat = new java.io.ByteArrayOutputStream()
      val crc = new java.util.zip.CRC32
      while (!seenIend) {
        if (pos + 12 > bytes.length) return None
        val len = be32(pos)
        if (len > bytes.length - pos - 12) return None
        val n = len.toInt
        crc.reset()
        crc.update(bytes, pos + 4, 4 + n)
        if (crc.getValue != be32(pos + 8 + n)) return None
        val tpe = new String(bytes, pos + 4, 4, "US-ASCII")
        tpe match {
          case "IHDR" =>
            if (seenIhdr || n != 13) return None
            w = be32(pos + 8); h = be32(pos + 12)
            // dimension sanity bounds the raster allocation BEFORE inflate
            if (w <= 0 || h <= 0 || w * h > (1L << 26)) return None
            if (bytes(pos + 16) != 8) return None // bit depth
            channels = bytes(pos + 17) match {
              case 0 => 1 // greyscale
              case 2 => 3 // truecolor
              case _ => return None
            }
            // compression, filter method, interlace must all be 0
            if (bytes(pos + 18) != 0 || bytes(pos + 19) != 0 ||
              bytes(pos + 20) != 0) return None
            seenIhdr = true
          case "IDAT" =>
            if (!seenIhdr) return None
            idat.write(bytes, pos + 8, n)
          case "IEND" =>
            if (!seenIhdr || n != 0) return None
            seenIend = true
          case _ =>
            if (!seenIhdr) return None // IHDR must be the first chunk
        }
        pos += 12 + n
      }
      val stride = (w * channels).toInt
      val expected = (stride + 1) * h.toInt
      val inflater = new java.util.zip.Inflater()
      inflater.setInput(idat.toByteArray)
      val scan = new Array[Byte](expected)
      var got = 0
      while (got < expected && !inflater.finished()) {
        val k = inflater.inflate(scan, got, expected - got)
        if (k == 0 && inflater.needsInput()) return None // truncated stream
        got += k
      }
      // exactly the advertised raster: no short stream, no trailing data
      val overflow = got == expected && !inflater.finished() &&
        inflater.inflate(new Array[Byte](1)) > 0
      inflater.end()
      if (got != expected || overflow) return None
      val out = new Array[Byte](stride * h.toInt)
      val bpp = channels
      var r = 0
      while (r < h) {
        val f = scan(r * (stride + 1)) & 0xff
        if (f > 4) return None
        var c = 0
        while (c < stride) {
          val x = scan(r * (stride + 1) + 1 + c) & 0xff
          val a = if (c >= bpp) out(r * stride + c - bpp) & 0xff else 0
          val b = if (r > 0) out((r - 1) * stride + c) & 0xff else 0
          val d = if (r > 0 && c >= bpp) out((r - 1) * stride + c - bpp) & 0xff else 0
          val v = f match {
            case 0 => x
            case 1 => x + a
            case 2 => x + b
            case 3 => x + (a + b) / 2
            case _ => // Paeth predictor
              val p = a + b - d
              val pa = math.abs(p - a)
              val pb = math.abs(p - b)
              val pc = math.abs(p - d)
              x + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else d)
          }
          out(r * stride + c) = (v & 0xff).toByte
          c += 1
        }
        r += 1
      }
      var s0 = 0L
      var c = 0
      while (c < stride) { s0 += out(c) & 0xff; c += 1 }
      Some((w, h, channels.toLong, w * channels * h, Some(s0)))
    } catch {
      case _: java.util.zip.DataFormatException => None
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
    * itself is out of scope (no codecs in this container), with the output
    * size estimated
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
