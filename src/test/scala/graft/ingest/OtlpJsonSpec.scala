package graft.ingest

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.streaming.OtlpSource

/** OTLP/HTTP JSON decode — a realistic collector export (proto3-JSON
  * encoding: 64-bit ints as strings, oneof value fields, enum numbers)
  * must decode to the exact export frame the file-stream source carries,
  * and flow through the standard per-type conversion unchanged. */
class OtlpJsonSpec extends SparkSpec {

  // ts = 2024-01-24T00:00:00Z in ns, as the string proto3-JSON mandates
  private val Ns = "1706054400000000000"
  private val MsExpected = 1706054400000L

  private val payload =
    s"""{"resourceMetrics":[{
       |  "resource":{"attributes":[
       |    {"key":"service.name","value":{"stringValue":"svc-a"}},
       |    {"key":"pid","value":{"intValue":"42"}},
       |    {"key":"up","value":{"boolValue":true}}]},
       |  "scopeMetrics":[{"metrics":[
       |    {"name":"cpu_load","gauge":{"dataPoints":[
       |      {"timeUnixNano":"$Ns","asDouble":0.75,
       |       "attributes":[{"key":"core","value":{"stringValue":"0"}}]}]}},
       |    {"name":"requests_total","sum":{
       |      "aggregationTemporality":2,"isMonotonic":true,
       |      "dataPoints":[{"timeUnixNano":"$Ns","asInt":"123",
       |        "attributes":[{"key":"status","value":{"stringValue":"200"}}],
       |        "exemplars":[
       |          {"filteredAttributes":[{"key":"q","value":{"stringValue":"x"}}],
       |           "timeUnixNano":"$Ns","asDouble":1.5,
       |           "spanId":"0102030405060708",
       |           "traceId":"0102030405060708090a0b0c0d0e0f10"},
       |          {"timeUnixNano":"$Ns","asInt":"7"}]}]}},
       |    {"name":"latency_ms","histogram":{
       |      "aggregationTemporality":2,
       |      "dataPoints":[{"timeUnixNano":"$Ns","count":"6","sum":21.5,
       |        "bucketCounts":["1","2","3"],"explicitBounds":[5.0,50.0],
       |        "attributes":[{"key":"endpoint","value":{"stringValue":"/api"}}],
       |        "exemplars":[{"timeUnixNano":"$Ns","asDouble":42.0,
       |          "traceId":"ffee000000000000000000000000aabb"}]}]}},
       |    {"name":"resp_exp","exponentialHistogram":{
       |      "aggregationTemporality":2,
       |      "dataPoints":[{"timeUnixNano":"$Ns","count":"4","sum":8.0}]}},
       |    {"name":"rt_summary","summary":{
       |      "dataPoints":[{"timeUnixNano":"$Ns","count":"9","sum":4.5}]}}
       |  ]}]}]}""".stripMargin.replaceAll("\n", "")

  test("decode: one resource row, every metric type, proto3-JSON quirks handled") {
    val s = spark
    import s.implicits._
    val export = OtlpJson.decode(Seq(payload).toDF("value"))
    // simpleString: same shape and types; the decode's literal-built fields
    // are tighter on nullability than the file-stream's read schema
    assert(export.schema.simpleString === OtlpSource.exportSchema.simpleString)
    val rows = export.collect()
    assert(rows.length === 1)
    val attrs = rows(0).getMap[String, String](0)
    // attribute value arms stringified (F10)
    assert(attrs === Map("service.name" -> "svc-a", "pid" -> "42", "up" -> "true"))

    val dps = OtlpSource.explodeExport(export)
      .orderBy(col("metric"))
      .collect()
    assert(dps.map(_.getAs[String]("metric")).toSeq ===
      Seq("cpu_load", "latency_ms", "requests_total", "resp_exp", "rt_summary"))
    assert(dps.forall(_.getAs[Long]("ts_ms") == MsExpected))

    val byMetric = dps.map(r => r.getAs[String]("metric") -> r).toMap
    val gauge = byMetric("cpu_load")
    assert(gauge.getAs[String]("kind") === "gauge")
    assert(gauge.getAs[Double]("value_double") === 0.75)
    assert(gauge.getAs[Map[String, String]]("dp_attrs") === Map("core" -> "0"))

    val sum0 = byMetric("requests_total")
    assert(sum0.getAs[String]("kind") === "sum")
    assert(sum0.getAs[Long]("value_int") === 123L) // int64-as-string oneof arm
    assert(sum0.getAs[Int]("temporality_code") === 2)
    assert(sum0.getAs[Boolean]("is_monotonic"))

    val hist = byMetric("latency_ms")
    assert(hist.getAs[String]("kind") === "histogram")
    assert(hist.getAs[Long]("count") === 6L)
    assert(hist.getAs[Double]("sum") === 21.5)
    assert(hist.getAs[Seq[Double]]("bounds") === Seq(5.0, 50.0))
    assert(hist.getAs[Seq[Long]]("bucket_counts") === Seq(1L, 2L, 3L))

    assert(byMetric("resp_exp").getAs[String]("kind") === "exponential_histogram")
    assert(byMetric("resp_exp").getAs[Long]("count") === 4L)
    assert(byMetric("rt_summary").getAs[String]("kind") === "summary")
    assert(byMetric("rt_summary").getAs[Long]("count") === 9L)
  }

  test("exemplars decode: hex IDs verbatim, value oneof, ns timestamp, filtered attrs") {
    val s = spark
    import s.implicits._
    val dps = OtlpSource.explodeExport(OtlpJson.decode(Seq(payload).toDF("value")))
      .select(col("metric"), col("exemplars"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[org.apache.spark.sql.Row](1)).toMap
    // no exemplars on the wire → typed NULL (convertExemplars' nil-on-empty)
    assert(dps("cpu_load") === null)
    assert(dps("rt_summary") === null)
    val sumEx = dps("requests_total")
    assert(sumEx.length === 2)
    // first: full exemplar — IDs kept as the wire's hex strings
    assert(sumEx(0).getAs[String]("spanId") === "0102030405060708")
    assert(sumEx(0).getAs[String]("traceId") === "0102030405060708090a0b0c0d0e0f10")
    assert(sumEx(0).getAs[Double]("value") === 1.5)
    assert(sumEx(0).getAs[java.sql.Timestamp]("timestamp").getTime === MsExpected)
    assert(sumEx(0).getAs[Map[String, String]]("attributes") === Map("q" -> "x"))
    // second: asInt arm widened, absent IDs null, no filtered attrs → empty map
    assert(sumEx(1).getAs[Double]("value") === 7.0)
    assert(sumEx(1).getAs[String]("spanId") === null)
    assert(sumEx(1).getAs[Map[String, String]]("attributes") === Map.empty)
    val histEx = dps("latency_ms")
    assert(histEx.length === 1)
    assert(histEx(0).getAs[Double]("value") === 42.0)
    assert(histEx(0).getAs[String]("traceId") === "ffee000000000000000000000000aabb")
  }

  test("decoded exemplars flow through capExemplars and read back from a raw tier") {
    val s = spark
    import s.implicits._
    import graft.sink.MetricsSink
    val exploded = OtlpSource.explodeExport(OtlpJson.decode(Seq(payload).toDF("value")))
    // the S4 cap (enabled, max 1) keeps the FIRST exemplar only
    val capped = exploded.withColumn("exemplars",
      Validation.capExemplars(col("exemplars"), enabled = true, max = 1))
    val dir = java.nio.file.Files.createTempDirectory("otlp_json_ex").toString
    MetricsSink.write(capped.withColumn("workspace_id", lit("ws-1")),
      dir, MetricsSink.Raw, col("ts_ms"),
      Seq(col("workspace_id"), col("metric")), mode = "overwrite")
    val back = MetricsSink.read(spark, dir, MetricsSink.Raw)
      .filter(col("metric") === "requests_total")
      .select(explode(col("exemplars")).as("e"))
      .select(col("e.spanId"), col("e.value")).collect()
    // capped to one; the survivor is the first wire exemplar, intact
    assert(back.map(r => (r.getString(0), r.getDouble(1))).toSeq ===
      Seq(("0102030405060708", 1.5)))
  }

  test("decoded export flows through the standard per-type conversion") {
    val s = spark
    import s.implicits._
    val converted = OtlpFlatten.convertDatapoints(
      OtlpSource.explodeExport(OtlpJson.decode(Seq(payload).toDF("value"))))
    val rows = converted
      .select(col("metric"), col("metric_type"), col("value"),
        size(col("buckets")).as("nb"),
        element_at(col("buckets"), -1).getField("le").as("last_le"))
      .collect().map(r => (r.getString(0), r.getByte(1).toInt)).toSet
    // gauge=1 sum=2 histogram=3 summary=4 exp=5, every type converted
    assert(rows === Set(("cpu_load", 1), ("requests_total", 2),
      ("latency_ms", 3), ("rt_summary", 4), ("resp_exp", 5)))
    // the histogram got its +Inf pad: 2 bounds + overflow = 3 buckets
    val h = converted.filter(col("metric") === "latency_ms")
      .select(size(col("buckets")),
        element_at(col("buckets"), -1).getField("le")).collect()(0)
    assert(h.getInt(0) === 3)
    assert(h.getDouble(1).isPosInfinity)
    // int64-as-string value widened to double (F11)
    val v = converted.filter(col("metric") === "requests_total")
      .select(col("value")).collect()(0).getDouble(0)
    assert(v === 123.0)
  }
}
