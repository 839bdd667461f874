package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** WARC source: the real binaryFile read path over hand-written record
  * bytes — extraction per record type, byte-exact Content-Length (UTF-8
  * bodies), and the quarantine contract (records before a corruption
  * survive; everything after is one quarantined remainder, never an
  * exception). */
class WarcSpec extends SparkSpec {

  private def record(uri: String, body: String,
      warcType: String = "response", lenShift: Int = 0,
      http: Boolean = true): Array[Byte] = {
    val payload =
      if (http) s"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n$body"
      else body
    val pBytes = payload.getBytes("UTF-8")
    (s"WARC/1.0\r\nWARC-Type: $warcType\r\nWARC-Target-URI: $uri\r\n" +
      s"Content-Length: ${pBytes.length + lenShift}\r\n\r\n").getBytes("US-ASCII") ++
      pBytes ++ "\r\n\r\n".getBytes("US-ASCII")
  }

  test("warc file read: response + resource records, unicode bodies, order") {
    val dir = Files.createTempDirectory("graft-warc").toFile
    val f1 = record("http://a/1", "hello world page one") ++
      record("http://a/2", "über straße maß", http = true) ++
      record("http://a/3", "raw resource payload", warcType = "resource",
        http = false)
    Files.write(new java.io.File(dir, "seg1.warc").toPath, f1)
    val rows = WarcSource.warc(spark, dir.getPath)
      .orderBy(col("src"), col("rec_idx")).collect()
    assert(rows.length === 3)
    assert(rows.forall(r => r.isNullAt(r.fieldIndex("corrupt"))),
      "no quarantine on a clean file")
    val r1 = rows(0)
    assert(r1.getString(2) === "response" && r1.getString(3) === "http://a/1")
    assert(r1.getInt(4) === 200 &&
      r1.getString(r1.fieldIndex("body")) === "hello world page one")
    // the HTTP Content-Type header surfaces raw (the filter normalizes)
    assert(r1.getString(5) === "text/plain")
    // unicode: Content-Length counted BYTES, the body decodes intact
    assert(rows(1).getString(rows(1).fieldIndex("body")) === "über straße maß")
    // resource record: no HTTP framing, payload IS the body, status and
    // content type null
    assert(rows(2).getString(2) === "resource")
    assert(rows(2).isNullAt(4) && rows(2).isNullAt(5))
    assert(rows(2).getString(rows(2).fieldIndex("body")) === "raw resource payload")
  }

  test("quarantine: records before a corruption survive, remainder flagged") {
    val dir = Files.createTempDirectory("graft-warc-bad").toFile
    // good record, then one whose Content-Length lies past EOF
    val f = record("http://b/1", "good first record") ++
      record("http://b/2", "never fully written", lenShift = 500)
    Files.write(new java.io.File(dir, "seg2.warc").toPath, f)
    // and a file corrupted at record 0 (bad magic)
    Files.write(new java.io.File(dir, "seg3.warc").toPath,
      "WORC/1.0\r\nContent-Length: 5\r\n\r\nxxxxx\r\n\r\n".getBytes("US-ASCII"))
    val parsed = WarcSource.warc(spark, dir.getPath)
    val (clean, quarantined) = WarcSource.quarantine(parsed)
    val cleanRows = clean.collect()
    assert(cleanRows.length === 1)
    assert(cleanRows(0).getAs[String]("uri") === "http://b/1")
    val q = quarantined.collect().map(r =>
      (r.getString(0).split('/').last, r.getString(2)))
    assert(q.length === 2)
    assert(q.exists(p => p._1 == "seg2.warc" && p._2.contains("truncated")))
    assert(q.exists(p => p._1 == "seg3.warc" && p._2.contains("bad record magic")))
  }

  test("responseFilter keeps 200 + allowlisted media, normalizes the type") {
    val s = spark
    import s.implicits._
    def rec(uri: String, status: String, ctype: String): Array[Byte] = {
      val payload = s"HTTP/1.1 $status\r\nContent-Type: $ctype\r\n\r\nbody"
        .getBytes("UTF-8")
      (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $uri\r\n" +
        s"Content-Length: ${payload.length}\r\n\r\n").getBytes("US-ASCII") ++
        payload ++ "\r\n\r\n".getBytes("US-ASCII")
    }
    val stream = rec("http://f/1", "200 OK", "text/html; charset=UTF-8") ++
      rec("http://f/2", "404 Not Found", "text/html") ++
      rec("http://f/3", "200 OK", "application/pdf") ++
      rec("http://f/4", "200 OK", "TEXT/PLAIN") ++
      record("http://f/5", "no http framing", warcType = "resource", http = false)
    val parsed = WarcSource.parseWarc(
      Seq(("s1", stream)).toDF("src", "content"))
    val kept = WarcSource.responseFilter(parsed)
      .select(col("uri"), col("media_type")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(kept === Set(("http://f/1", "text/html"), ("http://f/4", "text/plain")))
    // composes with quarantine's clean side (corrupt column already gone)
    val (clean, _) = WarcSource.quarantine(parsed)
    assert(WarcSource.responseFilter(clean).count() === 2)
  }

  test("bounded decode: an over-cap record truncates, the NEXT record still parses") {
    val big = "x" * 4000
    val f = record("http://d/1", big) ++ record("http://d/2", "after the giant")
    // cap below the big body: the decode is bounded and the body truncates,
    // but the walk advances by the DECLARED length so record 2 is intact
    val rows = WarcSource.walk("s", f, maxBodyChars = 100)
    assert(rows.length === 2)
    assert(rows(0).corrupt.isEmpty)
    assert(rows(0).body.get.length === 100)
    assert(rows(0).body.get === "x" * 100)
    assert(rows(1).body.contains("after the giant"))
    // default cap leaves normal records untouched
    val full = WarcSource.walk("s", f)
    assert(full(0).body.get === big)
  }

  test("warcStream: the landing-zone tail parses arriving segments") {
    val dir = Files.createTempDirectory("graft-warc-stream").toFile
    val ckpt = Files.createTempDirectory("graft-warc-ckpt").toFile
    Files.write(new java.io.File(dir, "seg1.warc").toPath,
      record("http://s/1", "streamed body one"))
    Files.write(new java.io.File(dir, "seg2.warc").toPath,
      record("http://s/2", "streamed body two") ++
        record("http://s/3", "streamed body three"))
    val q = WarcSource.warcStream(spark, dir.getPath)
      .writeStream.format("memory").queryName("warc_stream_rows")
      .option("checkpointLocation", ckpt.getPath)
      .start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("warc_stream_rows")
      .select(col("uri"), col("body"), col("corrupt")).collect()
    assert(got.length === 3)
    assert(got.forall(_.isNullAt(2)))
    assert(got.map(_.getString(0)).sorted.toSeq ===
      Seq("http://s/1", "http://s/2", "http://s/3"))
  }

  test("streaming first-mile: landing zone → response gate → URL dedup across batches") {
    val dir = Files.createTempDirectory("graft-warc-fm").toFile
    val ckpt = Files.createTempDirectory("graft-warc-fm-ckpt").toFile
    // batch 1: two fetches whose URLs canonicalize apart
    Files.write(new java.io.File(dir, "seg1.warc").toPath,
      record("http://A.example/x?utm_source=feed", "page one", http = true) ++
        record("http://b.example/y", "page two", http = true))
    val gated = graft.llm.UrlCuration.canonicalize(col("uri"))
    val q = WarcSource.responseFilter(WarcSource.warcStream(spark, dir.getPath))
      .withColumn("url_canon", gated)
      .select(col("url_canon"), col("body"))
      .dropDuplicates("url_canon")
      .writeStream.format("memory").queryName("warc_first_mile")
      .option("checkpointLocation", ckpt.getPath)
      .start()
    try {
      q.processAllAvailable()
      // batch 2: a RE-FETCH of page one under a different spelling of the
      // same canonical URL (+ one genuinely new page) — the stateful dedup
      // must drop it in a LATER micro-batch, i.e. state survived
      Files.write(new java.io.File(dir, "seg2.warc").toPath,
        record("HTTP://A.EXAMPLE:80/x#frag", "page one refetch", http = true) ++
          record("http://c.example/z", "page three", http = true))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("warc_first_mile").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(got.keySet === Set("http://a.example/x", "http://b.example/y",
      "http://c.example/z"))
    assert(got("http://a.example/x") === "page one", "first fetch must win")
  }

  test("walk edges: empty file, missing separator, non-numeric length") {
    assert(WarcSource.walk("s", Array.emptyByteArray).isEmpty)
    val noSep = record("http://c/1", "body").dropRight(4) ++
      "XXWARC/1.0".getBytes("US-ASCII")
    val r1 = WarcSource.walk("s", noSep)
    assert(r1.exists(_.corrupt.exists(_.contains("missing record separator"))))
    val badLen = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "Content-Length: many\r\n\r\n").getBytes("US-ASCII")
    val r2 = WarcSource.walk("s", badLen)
    assert(r2.exists(_.corrupt.exists(_.contains("non-numeric Content-Length"))))
    // a record ending the file exactly (no trailing separator) is legal
    val exact = record("http://c/2", "tail body").dropRight(4)
    val r3 = WarcSource.walk("s", exact)
    assert(r3.length === 1 && r3.head.corrupt.isEmpty)
    assert(r3.head.body.contains("tail body"))
  }

  private def gzipMember(plain: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(plain); gz.close()
    bos.toByteArray
  }

  test(".warc.gz: multi-member (Common Crawl shape) inflates and parses") {
    // one gzip member PER RECORD, concatenated — the form crawls ship
    val f = gzipMember(record("http://g/1", "gz page one")) ++
      gzipMember(record("http://g/2", "gz päge twö"))
    val rows = WarcSource.walk("s.warc.gz", f)
    assert(rows.length === 2)
    assert(rows.forall(_.corrupt.isEmpty))
    assert(rows.map(_.uri.get) === Seq("http://g/1", "http://g/2"))
    assert(rows(1).body.get === "gz päge twö")
    // and through the real binaryFile read path
    val dir = Files.createTempDirectory("graft-warc-gz").toFile
    Files.write(new java.io.File(dir, "seg.warc.gz").toPath, f)
    assert(WarcSource.warc(spark, dir.getPath).count() === 2)
  }

  test(".warc.gz: corrupt member keeps the inflated prefix, quarantines rest") {
    val good = gzipMember(record("http://g/1", "survives"))
    val bad = gzipMember(record("http://g/2", "lost")).updated(14, 0xEE.toByte)
    val rows = WarcSource.walk("s", good ++ bad)
    assert(rows.head.uri.contains("http://g/1") && rows.head.corrupt.isEmpty)
    assert(rows.last.corrupt.exists(_.contains("corrupt gzip stream")))
    // garbage right after the gzip magic: nothing parses, one quarantine row
    val r2 = WarcSource.walk("s", Array(0x1f, 0x8b, 0x00, 0x00).map(_.toByte))
    assert(r2.length === 1 && r2.head.corrupt.exists(_.contains("gzip")))
  }

  test(".warc.gz: expansion cap trips as a quarantined remainder (bomb posture)") {
    val f = gzipMember(record("http://g/1", "small")) ++
      gzipMember(record("http://g/2", "y" * 100000))
    val cap = WarcSource.gunzip(f, cap = 300)
    assert(cap._2.exists(_.contains("over 300-byte cap")))
    assert(cap._1.length === 300, "inflation stops AT the cap")
    // uncapped: both members inflate, both records parse
    val (plain, none) = WarcSource.gunzip(f)
    assert(none.isEmpty)
    assert(WarcSource.walk("s", plain).count(_.corrupt.isEmpty) === 2)
  }
}
