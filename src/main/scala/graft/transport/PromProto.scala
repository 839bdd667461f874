package graft.transport

/** Minimal protobuf wire codec for the Prometheus remote-read messages the
  * reference's endpoint speaks (pkg/promread/handler.go:65-107; message
  * shapes are the public prometheus/prompb definitions):
  *
  *   ReadRequest  { repeated Query queries = 1 }
  *   Query        { int64 start_timestamp_ms = 1; int64 end_timestamp_ms = 2;
  *                  repeated LabelMatcher matchers = 3; (hints = 4 skipped) }
  *   LabelMatcher { enum Type { EQ NEQ RE NRE } type = 1;
  *                  string name = 2; string value = 3 }
  *   ReadResponse { repeated QueryResult results = 1 }
  *   QueryResult  { repeated TimeSeries timeseries = 1 }
  *   TimeSeries   { repeated Label labels = 1; repeated Sample samples = 2 }
  *   Label        { string name = 1; string value = 2 }
  *   Sample       { double value = 1; int64 timestamp = 2 }
  *
  * Hand-rolled because the runtime ships no protobuf-java: the engine needs
  * exactly these seven fixed message shapes, read and written with the three
  * wire types they use (varint, fixed64, length-delimited). Unknown fields
  * are skipped by wire type, so requests from real Prometheus builds (which
  * set hints and accepted_response_types) decode fine. Both directions are
  * implemented so the loopback spec can speak the wire format as a client. */
object PromProto {

  final case class LabelMatcher(tpe: Int, name: String, value: String)
  final case class Query(startMs: Long, endMs: Long, matchers: Seq[LabelMatcher])
  final case class TimeSeries(labels: Seq[(String, String)],
      samples: Seq[(Double, Long)])

  // Wire primitives live in [[ProtoWire]], shared with the OTLP codec.
  private type Reader = ProtoReader
  private type Writer = ProtoWriter

  // fixed64 double must be writable even when 0.0 is meaningful? Prometheus
  // proto3 omits zero-valued fields; decoders default them to 0 — symmetric.

  // ---- ReadRequest --------------------------------------------------------

  def decodeReadRequest(body: Array[Byte]): Seq[Query] = {
    val r = new Reader(body)
    val qs = Seq.newBuilder[Query]
    while (r.hasRemaining) {
      val tag = r.readVarint()
      if ((tag >> 3) == 1 && (tag & 7) == 2) qs += decodeQuery(r.readBytes())
      else r.skip((tag & 7).toInt)
    }
    qs.result()
  }

  private def decodeQuery(b: Array[Byte]): Query = {
    val r = new Reader(b)
    var start = 0L; var end = 0L
    val ms = Seq.newBuilder[LabelMatcher]
    while (r.hasRemaining) {
      val tag = r.readVarint()
      ((tag >> 3).toInt, (tag & 7).toInt) match {
        case (1, 0) => start = r.readVarint()
        case (2, 0) => end = r.readVarint()
        case (3, 2) => ms += decodeMatcher(r.readBytes())
        case (_, w) => r.skip(w)
      }
    }
    Query(start, end, ms.result())
  }

  private def decodeMatcher(b: Array[Byte]): LabelMatcher = {
    val r = new Reader(b)
    var tpe = 0; var name = ""; var value = ""
    while (r.hasRemaining) {
      val tag = r.readVarint()
      ((tag >> 3).toInt, (tag & 7).toInt) match {
        case (1, 0) => tpe = r.readVarint().toInt
        case (2, 2) => name = new String(r.readBytes(), "UTF-8")
        case (3, 2) => value = new String(r.readBytes(), "UTF-8")
        case (_, w) => r.skip(w)
      }
    }
    LabelMatcher(tpe, name, value)
  }

  def encodeReadRequest(queries: Seq[Query]): Array[Byte] = {
    val w = new Writer
    queries.foreach { q =>
      val qw = new Writer
      qw.int64(1, q.startMs)
      qw.int64(2, q.endMs)
      q.matchers.foreach { m =>
        val mw = new Writer
        mw.int64(1, m.tpe.toLong)
        mw.string(2, m.name)
        mw.string(3, m.value)
        qw.bytes(3, mw.result())
      }
      w.bytes(1, qw.result())
    }
    w.result()
  }

  // ---- ReadResponse -------------------------------------------------------

  def encodeReadResponse(results: Seq[Seq[TimeSeries]]): Array[Byte] = {
    val w = new Writer
    results.foreach { series =>
      val rw = new Writer
      series.foreach { ts =>
        val tw = new Writer
        ts.labels.foreach { case (n, v) =>
          val lw = new Writer
          lw.string(1, n); lw.string(2, v)
          tw.bytes(1, lw.result())
        }
        ts.samples.foreach { case (v, t) =>
          val sw = new Writer
          sw.double(1, v); sw.int64(2, t)
          tw.bytes(2, sw.result())
        }
        rw.bytes(1, tw.result())
      }
      w.bytes(1, rw.result())
    }
    w.result()
  }

  def decodeReadResponse(body: Array[Byte]): Seq[Seq[TimeSeries]] = {
    val r = new Reader(body)
    val out = Seq.newBuilder[Seq[TimeSeries]]
    while (r.hasRemaining) {
      val tag = r.readVarint()
      if ((tag >> 3) == 1 && (tag & 7) == 2) out += decodeQueryResult(r.readBytes())
      else r.skip((tag & 7).toInt)
    }
    out.result()
  }

  private def decodeQueryResult(b: Array[Byte]): Seq[TimeSeries] = {
    val r = new Reader(b)
    val out = Seq.newBuilder[TimeSeries]
    while (r.hasRemaining) {
      val tag = r.readVarint()
      if ((tag >> 3) == 1 && (tag & 7) == 2) out += decodeTimeSeries(r.readBytes())
      else r.skip((tag & 7).toInt)
    }
    out.result()
  }

  private def decodeTimeSeries(b: Array[Byte]): TimeSeries = {
    val r = new Reader(b)
    val labels = Seq.newBuilder[(String, String)]
    val samples = Seq.newBuilder[(Double, Long)]
    while (r.hasRemaining) {
      val tag = r.readVarint()
      ((tag >> 3).toInt, (tag & 7).toInt) match {
        case (1, 2) =>
          val lr = new Reader(r.readBytes())
          var n = ""; var v = ""
          while (lr.hasRemaining) {
            val lt = lr.readVarint()
            ((lt >> 3).toInt, (lt & 7).toInt) match {
              case (1, 2) => n = new String(lr.readBytes(), "UTF-8")
              case (2, 2) => v = new String(lr.readBytes(), "UTF-8")
              case (_, w) => lr.skip(w)
            }
          }
          labels += ((n, v))
        case (2, 2) =>
          val sr = new Reader(r.readBytes())
          var value = 0.0; var ts = 0L
          while (sr.hasRemaining) {
            val st = sr.readVarint()
            ((st >> 3).toInt, (st & 7).toInt) match {
              case (1, 1) => value = sr.readDouble()
              case (2, 0) => ts = sr.readVarint()
              case (_, w) => sr.skip(w)
            }
          }
          samples += ((value, ts))
        case (_, w) => r.skip(w)
      }
    }
    TimeSeries(labels.result(), samples.result())
  }
}
