package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * All queries take an `sfDir` (e.g. /root/testdata/sf0.01) and read only the
  * tables they need — so Catalyst sees one scan per table and can push filters
  * and prune columns into the parquet reader.
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** events.parquet carries nanosecond-precision timestamps, which Spark's
    * parquet reader rejects ([PARQUET_TYPE_ILLEGAL] — TimestampType is µs).
    * The session must be BUILT with `spark.sql.legacy.parquet.nanosAsLong=
    * true` (Verify/Bench/test sessions all are — see [[graft.Sessions]]);
    * setting it here at read time would be a global side effect silently
    * changing other reads in the same session. The ns column then arrives as
    * long and is converted to a µs TimestampType `ts`. The µs truncation is
    * deliberate and mirrored on the oracle side where sub-µs precision would
    * leak into results (we only ever emit ts through date_trunc or
    * unix_millis).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    require(s.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"),
      "build the session with spark.sql.legacy.parquet.nanosAsLong=true " +
        "(see graft.Sessions.builder) — events.parquet has ns timestamps")
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => df
    }
  }
}
