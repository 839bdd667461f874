package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

import graft.metrics.EventsMetrics
import graft.model.Tables

/** Schema-drift guard for the events table (r10 postmortem: the driver
  * regenerated testdata and switched `ts` from ns-as-long INT64 to µs
  * TIMESTAMP_NTZ, which broke 32 of 67 queries at analysis time). This spec
  * writes the same fixture under all three encodings the driver has shipped
  * or could ship — ns-precision INT64, µs TIMESTAMP (adjusted to UTC), and µs
  * TIMESTAMP_NTZ — and pins that Tables.events + EventsMetrics produce
  * identical `ts_ms` for each. If the driver changes encoding again, THIS
  * fails with a named assertion instead of 37 suites failing with a Catalyst
  * type error.
  */
class TablesSpec extends SparkSpec {

  // fixed µs-epoch instants (UTC), incl. sub-ms precision to pin the floor
  // behavior (driver timestamps are all post-1970, so only positives pinned)
  private val micros =
    Seq(0L, 1L, 999L, 1000L, 1723500000123456L, 1723456789999999L)

  private def writeFixture(encode: String): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory(s"graft_events_$encode").toString
    val base = micros.zipWithIndex
      .toDF("us", "event_id")
      .select(
        col("event_id").cast("long"),
        col("us"),
        (col("event_id") % 3).cast("long").as("user_id"),
        concat(lit("t"), (col("event_id") % 2).cast("string")).as("event_type"),
        (col("event_id") * 1.5).as("value"),
        lit("{}").as("props"))
    val withTs = encode match {
      case "ns_long" => base.withColumn("ts", col("us") * 1000L)
      case "ts_utc"  => base.withColumn("ts", timestamp_micros(col("us")))
      case "ts_ntz" =>
        base.withColumn("ts", timestamp_micros(col("us")).cast(TimestampNTZType))
    }
    withTs.drop("us")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("events loader normalizes all three ts encodings to identical ts_ms") {
    val byEncoding = Seq("ns_long", "ts_utc", "ts_ntz").map { enc =>
      val dir = writeFixture(enc)
      val loaded = Tables.events(spark, dir)
      // the loader's contract: a µs-precision session-zoned TimestampType
      assert(loaded.schema("ts").dataType == TimestampType,
        s"encoding $enc: Tables.events must yield TimestampType")
      val rows = EventsMetrics.fromEventsDf(loaded)
        .select("event_id", "ts_ms")
        .collect()
        .map(r => r.getLong(0) -> r.getLong(1))
        .toMap
      enc -> rows
    }.toMap

    val expected = micros.zipWithIndex.map { case (us, id) =>
      id.toLong -> Math.floorDiv(us, 1000L)
    }.toMap
    byEncoding.foreach { case (enc, rows) =>
      assert(rows == expected, s"encoding $enc: ts_ms mismatch")
    }
  }

  test("round-trip: the writer encodings actually read back as distinct types") {
    // guards the guard: if Spark's reader config ever stops inferring NTZ (or
    // starts converting long→timestamp), the three fixtures would silently
    // collapse into one branch and the drift test would stop covering them
    import org.apache.spark.sql.types.LongType
    val types = Seq("ns_long" -> LongType, "ts_ntz" -> TimestampNTZType,
      "ts_utc" -> TimestampType)
    types.foreach { case (enc, expectedRaw) =>
      val dir = writeFixture(enc)
      val raw = spark.read.parquet(s"$dir/events.parquet")
      assert(raw.schema("ts").dataType == expectedRaw,
        s"fixture $enc read back as ${raw.schema("ts").dataType}")
    }
  }

  test("events loader widens narrow numeric encodings (int32 ids, float value)") {
    import org.apache.spark.sql.types.{DoubleType, LongType}
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_events_narrow").toString
    micros.zipWithIndex.toDF("us", "event_id")
      .select(
        col("event_id").cast("int"),
        timestamp_micros(col("us")).as("ts"),
        (col("event_id") % 3).cast("int").as("user_id"),
        lit("t0").as("event_type"),
        (col("event_id") * 1.5).cast("float").as("value"),
        lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val loaded = Tables.events(spark, dir)
    assert(loaded.schema("event_id").dataType == LongType)
    assert(loaded.schema("user_id").dataType == LongType)
    assert(loaded.schema("value").dataType == DoubleType)
    // and the canonical current-encoding load is untouched by the fold
    val std = Tables.events(spark, writeFixture("ts_ntz"))
    assert(std.schema("value").dataType == DoubleType)
  }

  test("documents/embeddings loaders widen int32 ids; lossy narrows refuse") {
    import org.apache.spark.sql.types.LongType
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_docs_narrow").toString
    Seq((1, "a b", "en", "web", 3), (2, "c", "en", "web", 1))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .select(col("doc_id").cast("int"), col("text"), col("lang"),
        col("source"), col("n_chars").cast("int"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val docs = Tables.documents(spark, dir)
    assert(docs.schema("doc_id").dataType == LongType)
    assert(docs.schema("n_chars").dataType == LongType)

    // a float-encoded id is NOT a widening — the loader must refuse, not
    // silently round
    Seq((1.5f, "x")).toDF("vec_id", "junk")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val e = intercept[IllegalStateException](Tables.embeddings(spark, dir))
    assert(e.getMessage.contains("vec_id"))
  }

  test("lineitem loader normalizes all four l_shipdate encodings identically") {
    import org.apache.spark.sql.types.{DateType, StringType, TimestampNTZType, TimestampType}
    val days = Seq("1994-01-01", "1994-01-31", "1996-12-15", "1998-08-02")
    def writeLineitem(encode: String): String = {
      import spark.implicits._
      val dir = Files.createTempDirectory(s"graft_li_$encode").toString
      val base = days.zipWithIndex.toDF("d", "l_orderkey")
        .select(col("l_orderkey").cast("long"), col("d"),
          lit(1.0).as("l_quantity"), lit("N").as("l_returnflag"))
      val withDate = encode match {
        case "date"   => base.withColumn("l_shipdate", col("d").cast(DateType))
        case "ts"     => base.withColumn("l_shipdate", col("d").cast(TimestampType))
        case "ts_ntz" => base.withColumn("l_shipdate", col("d").cast(TimestampNTZType))
        case "string" => base.withColumn("l_shipdate", col("d"))
      }
      withDate.drop("d")
        .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
      dir
    }
    val byEncoding = Seq("date", "ts", "ts_ntz", "string").map { enc =>
      val dir = writeLineitem(enc)
      val loaded = Tables.lineitem(spark, dir)
      assert(loaded.schema("l_shipdate").dataType == TimestampType,
        s"encoding $enc: Tables.lineitem must yield TimestampType")
      // pin through the actual consumer shape: date_format month bucketing
      val months = loaded
        .select(col("l_orderkey"),
          date_format(col("l_shipdate"), "yyyy-MM").as("m"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      enc -> months
    }.toMap
    val expected = days.zipWithIndex
      .map { case (d, id) => id.toLong -> d.substring(0, 7) }.toMap
    byEncoding.foreach { case (enc, months) =>
      assert(months == expected, s"encoding $enc: month bucketing mismatch")
    }
    // string fixtures must actually read back as strings for the guard to cover
    val raw = spark.read.parquet(s"${writeLineitem("string")}/lineitem.parquet")
    assert(raw.schema("l_shipdate").dataType == StringType)
  }

  test("driver testdata loads and yields positive ts_ms range") {
    // whatever encoding the CURRENT driver testdata uses, the loader must
    // accept it — this is the first test to fail on a fresh regeneration
    val df = EventsMetrics.fromEvents(spark, Sf)
    val agg = df.agg(min("ts_ms"), max("ts_ms"), count("*")).head()
    assert(agg.getLong(2) > 0, "events table is empty")
    assert(agg.getLong(0) > 0L, "ts_ms should be positive epoch millis")
  }
}
