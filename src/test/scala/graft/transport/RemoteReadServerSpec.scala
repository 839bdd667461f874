package graft.transport

import java.net.{HttpURLConnection, URI}
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.xerial.snappy.Snappy

import graft.SparkSpec
import graft.metrics.EventsMetrics
import graft.query.Promread
import graft.sink.{MetricsSink, RollupMaintenance}

/** Loopback integration of the network shell (handler.go:65-107): a real
  * HTTP round trip — snappy+protobuf ReadRequest up, routed query against
  * the stored tiers, snappy+protobuf ReadResponse down — plus the ingest
  * landing endpoint, and a pure codec round-trip pinning the wire format. */
class RemoteReadServerSpec extends SparkSpec {

  private val NowA = java.time.Instant.parse("2024-01-10T00:00:00Z").toEpochMilli
  private val keys = Seq(col("workspace_id"), col("metric"))

  private lazy val store: String = {
    val b = Files.createTempDirectory("graft_transport").toString
    MetricsSink.write(
      EventsMetrics.withHistogram(EventsMetrics.fromEvents(spark, Sf)),
      b, MetricsSink.Raw, col("ts_ms"), keys, mode = "overwrite")
    RollupMaintenance.refreshCascade(spark, b, NowA, keys,
      col("ts_ms"), col("event_id"))
    b
  }

  private def post(port: Int, path: String, body: Array[Byte],
      contentType: String = ""): (Int, Array[Byte]) = {
    val conn = new URI(s"http://127.0.0.1:$port$path").toURL
      .openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod("POST")
    conn.setDoOutput(true)
    if (contentType.nonEmpty) conn.setRequestProperty("Content-Type", contentType)
    conn.getOutputStream.write(body)
    val code = conn.getResponseCode
    val in = if (code < 400) conn.getInputStream else conn.getErrorStream
    val resp = in.readAllBytes()
    conn.disconnect()
    (code, resp)
  }

  private def withServer[T](sourceDir: String)(body: (RemoteReadServer, Int) => T): T = {
    val srv = new RemoteReadServer(spark, store, sourceDir, "ws-1", NowA)
    val port = srv.start()
    try body(srv, port) finally srv.stop()
  }

  test("wire codec round-trips requests and responses") {
    val req = Seq(PromProto.Query(1000L, 2000L, Seq(
      PromProto.LabelMatcher(2, "__name__", "^evt_.*$"),
      PromProto.LabelMatcher(1, "user", "3"))))
    assert(PromProto.decodeReadRequest(PromProto.encodeReadRequest(req)) === req)
    val resp = Seq(Seq(
      PromProto.TimeSeries(Seq("__name__" -> "m1", "k" -> "v"),
        Seq((1.5, 1000L), (2.5, 2000L))),
      PromProto.TimeSeries(Seq("__name__" -> "m2"), Seq((0.25, 9L)))))
    assert(PromProto.decodeReadResponse(PromProto.encodeReadResponse(resp)) === resp)
  }

  test("wire codec fuzz: random messages round-trip, extremes included") {
    val rnd = new scala.util.Random(4242)
    def rs(): String = {
      val n = rnd.nextInt(12)
      (0 until n).map(_ => (rnd.nextInt(0xD7FF - 32) + 32).toChar).mkString
    }
    def rLong(): Long = rnd.nextInt(5) match {
      case 0 => 0L
      case 1 => Long.MaxValue
      case 2 => Long.MinValue
      case 3 => -rnd.nextLong().abs
      case _ => rnd.nextLong()
    }
    def rDouble(): Double = rnd.nextInt(7) match {
      case 0 => 0.0
      case 1 => -0.0
      case 2 => Double.PositiveInfinity
      case 3 => Double.NegativeInfinity
      case 4 => Double.MinPositiveValue
      case _ => (rnd.nextDouble() - 0.5) * 1e12
    }
    for (_ <- 1 to 300) {
      val req = Seq.fill(rnd.nextInt(4))(PromProto.Query(rLong(), rLong(),
        Seq.fill(rnd.nextInt(4))(
          PromProto.LabelMatcher(rnd.nextInt(4), rs(), rs()))))
      assert(PromProto.decodeReadRequest(PromProto.encodeReadRequest(req)) === req)
      val resp = Seq.fill(rnd.nextInt(3))(Seq.fill(rnd.nextInt(3))(
        PromProto.TimeSeries(
          Seq.fill(rnd.nextInt(4))((rs(), rs())),
          Seq.fill(rnd.nextInt(5))((rDouble(), rLong())))))
      assert(PromProto.decodeReadResponse(PromProto.encodeReadResponse(resp)) === resp)
    }
  }

  test("loopback remote read: raw-routed query over HTTP equals the direct read path") {
    val src = Files.createTempDirectory("graft_transport_src").toString
    withServer(src) { (_, port) =>
      // start=end=0 short-circuits routing to raw (handler.go:304-307)
      val req = PromProto.encodeReadRequest(Seq(PromProto.Query(0L, 0L, Seq(
        PromProto.LabelMatcher(2, "__name__", "^evt_(purchase|signup)$")))))
      val (code, body) = post(port, "/api/v1/read", Snappy.compress(req))
      assert(code === 200)
      val results = PromProto.decodeReadResponse(Snappy.uncompress(body))
      assert(results.length === 1)
      val series = results.head
      assert(series.nonEmpty)
      // every series carries __name__ + sorted attribute labels
      assert(series.forall(_.labels.head._1 == "__name__"))
      assert(series.forall(ts => ts.labels.head._2.startsWith("evt_")))
      // totals match the equivalent direct query
      val direct = EventsMetrics.withHistogram(
        EventsMetrics.fromEvents(spark, Sf))
        .filter(Promread.predicate(
          Seq(Promread.Matcher("__name__", Promread.RE, "^evt_(purchase|signup)$")),
          workspaceId = "ws-1", startMs = 0L, endMs = 0L))
        .withColumn("sample_value",
          Promread.sampleValue(col("value"), col("count"), col("sum")))
        .filter(col("sample_value").isNotNull)
      assert(series.map(_.samples.length).sum === direct.count())
      val directSum = direct.agg(sum(col("sample_value"))).collect()(0).getDouble(0)
      val gotSum = series.flatMap(_.samples.map(_._1)).sum
      assert(math.abs(gotSum - directSum) / math.abs(directSum) < 1e-9)
    }
  }

  test("loopback remote read: aged window routes to the stored 1m tier") {
    val src = Files.createTempDirectory("graft_transport_src").toString
    withServer(src) { (srv, port) =>
      // age < 15d, span 20h < 24h → metrics_1m (handler.go:308-312)
      val startMs = NowA - 20 * 3600 * 1000L
      val req = PromProto.Query(startMs, NowA, Seq(
        PromProto.LabelMatcher(2, "__name__", "^evt_.*$")))
      assert(Promread.selectTable(startMs, NowA, NowA) === "metrics_1m")
      val (code, body) = post(port, "/api/v1/read",
        Snappy.compress(PromProto.encodeReadRequest(Seq(req))))
      assert(code === 200)
      val series = PromProto.decodeReadResponse(Snappy.uncompress(body)).head
      assert(series.nonEmpty)
      // sample count equals the stored tier's qualifying rows
      val tierRows = MetricsSink.read(spark, store, MetricsSink.M1)
        .filter(Promread.predicate(
          Seq(Promread.Matcher("__name__", Promread.RE, "^evt_.*$")),
          workspaceId = "ws-1", startMs = startMs, endMs = NowA,
          tsMsCol = col("bucket_ms")))
        .withColumn("sample_value",
          Promread.sampleValue(col("value_last"), col("count"), col("sum")))
        .filter(col("sample_value").isNotNull)
      assert(series.map(_.samples.length).sum === tierRows.count())
      // HTTP result == in-process query result, wire codec transparent
      assert(series === srv.query(req))
    }
  }

  test("ingest endpoint decodes a collector's OTLP/HTTP+JSON export") {
    val src = Files.createTempDirectory("graft_transport_src").toString
    withServer(src) { (_, port) =>
      val json =
        """{"resourceMetrics":[{"resource":{"attributes":[
          |{"key":"service.name","value":{"stringValue":"svc-json"}}]},
          |"scopeMetrics":[{"metrics":[{"name":"m_json","sum":{
          |"aggregationTemporality":2,"isMonotonic":true,
          |"dataPoints":[{"timeUnixNano":"1706054399000000000","asDouble":7.5}]
          |}}]}]}]}""".stripMargin.replaceAll("\n", "")
      val (code, name) = post(port, "/ingest", json.getBytes("UTF-8"),
        contentType = "application/json")
      assert(code === 200)
      val landed = new java.io.File(src, new String(name, "UTF-8"))
      assert(landed.exists)
      val back = spark.read.schema(graft.streaming.OtlpSource.exportSchema)
        .parquet(landed.getPath)
        .select(element_at(col("resource_attrs"), "service.name"),
          explode(col("datapoints")).as("dp"))
        .select(col("dp.metric"), col("dp.kind"), col("dp.ts_ms"),
          col("dp.value_double"))
        .collect()
      assert(back.map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSeq ===
        Seq(("m_json", "sum", 1706054399000L, 7.5)))
    }
  }

  test("ingest endpoint lands an export batch atomically in the source dir") {
    val src = Files.createTempDirectory("graft_transport_src").toString
    withServer(src) { (_, port) =>
      import scala.jdk.CollectionConverters._
      val dp = org.apache.spark.sql.Row("m_up", "sum", NowA - 1000L, 1, true,
        null, 42.0, null, null, null, null, Map("k" -> "v"), null)
      val export = spark.createDataFrame(
        Seq(org.apache.spark.sql.Row(Map("service.name" -> "svc"), Seq(dp))).asJava,
        graft.streaming.OtlpSource.exportSchema)
      val tmp = Files.createTempDirectory("up").toString
      export.coalesce(1).write.mode("overwrite").parquet(tmp)
      val bytes = java.nio.file.Files.readAllBytes(
        new java.io.File(tmp).listFiles
          .filter(_.getName.endsWith(".parquet")).head.toPath)
      val (code, name) = post(port, "/ingest", bytes)
      assert(code === 200)
      val landed = new java.io.File(src, new String(name, "UTF-8"))
      assert(landed.exists)
      val back = spark.read.schema(graft.streaming.OtlpSource.exportSchema)
        .parquet(landed.getPath)
      assert(back.count() === 1)
      assert(back.select(explode(col("datapoints")).as("dp"))
        .select(col("dp.metric"), col("dp.value_double")).collect()
        .map(r => (r.getString(0), r.getDouble(1))).toSeq === Seq(("m_up", 42.0)))
    }
  }
}
