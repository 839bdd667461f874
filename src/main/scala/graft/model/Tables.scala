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
  def orders(s: SparkSession, d: String): DataFrame =
    normalizeDateCol(load(s, d, "orders"), "o_orderdate")
  def lineitem(s: SparkSession, d: String): DataFrame =
    normalizeDateCol(load(s, d, "lineitem"), "l_shipdate")

  /** Date-valued columns get the same drift insurance as events.ts: the
    * driver's testdata generator has already flipped one column's physical
    * encoding between rounds (events.ts, round 10), and the TPC-H date
    * columns have equally many plausible encodings — DATE, µs TIMESTAMP,
    * µs TIMESTAMP_NTZ (pandas' default), or ISO string. All are normalized
    * to session-zoned TimestampType, which every consumer (`date_format`
    * bucketing, min/max) already handles; the session TZ is pinned UTC so
    * each cast is value-preserving and matches DuckDB's read of the file.
    * An encoding outside this set fails HERE with the column named, not
    * downstream with a Catalyst type error.
    */
  private def normalizeDateCol(df: DataFrame, name: String): DataFrame = {
    import org.apache.spark.sql.types.{DateType, StringType, TimestampNTZType, TimestampType}
    df.schema(name).dataType match {
      case TimestampType => df
      case DateType | TimestampNTZType | StringType =>
        df.withColumn(name, col(name).cast(TimestampType))
      case other =>
        throw new IllegalStateException(
          s"$name has unsupported type $other — extend Tables.normalizeDateCol " +
            "(expected DATE, TIMESTAMP, TIMESTAMP_NTZ, or an ISO-8601 string)")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame =
    widenNumerics(load(s, d, "documents"), "doc_id" -> "long", "n_chars" -> "long")
  def embeddings(s: SparkSession, d: String): DataFrame =
    widenNumerics(load(s, d, "embeddings"), "vec_id" -> "long")

  /** Numeric width insurance shared by the loaders: a regenerated file
    * shipping an id as INT32 or a measure as FLOAT must not ripple a schema
    * change into consumers (typed encoders and union-by-name against scratch
    * tables are exact-type-sensitive even where Column arithmetic is not).
    * Only lossless-or-documented widenings are accepted; anything else fails
    * at the loader with the column named.
    */
  private def widenNumerics(df: DataFrame, wanted: (String, String)*): DataFrame = {
    import org.apache.spark.sql.types.{DoubleType, FloatType, IntegerType, LongType}
    wanted.foldLeft(df) { case (acc, (name, want)) =>
      val wantType = want match {
        case "long" => LongType
        case "double" => DoubleType
      }
      (acc.schema(name).dataType, wantType) match {
        case (t, w) if t == w => acc
        case (IntegerType, LongType) |
             (IntegerType | LongType | FloatType, DoubleType) =>
          acc.withColumn(name, col(name).cast(wantType))
        case (other, _) =>
          throw new IllegalStateException(
            s"$name has unsupported type $other — extend Tables.widenNumerics")
      }
    }
  }

  /** The driver has shipped events.parquet under three different `ts`
    * encodings across rounds, so this loader normalizes ALL of them to a
    * µs-precision session-zoned TimestampType `ts` — downstream code
    * (EventsMetrics.tsMs → unix_millis, rollup bucketing, promread bounds)
    * assumes exactly that type:
    *
    *   - ns-precision INT64 timestamp (rounds ≤9): Spark's reader rejects it
    *     ([PARQUET_TYPE_ILLEGAL]) unless the session was BUILT with
    *     `spark.sql.legacy.parquet.nanosAsLong=true` ([[graft.Sessions]] sets
    *     it; setting it here at read time would be a global side effect). The
    *     column then arrives as LongType ns and is floored to µs.
    *   - µs TIMESTAMP_NTZ (`isAdjustedToUTC=false`, round 10+): arrives as
    *     TimestampNTZType; cast to TimestampType. The session timezone is
    *     pinned to UTC (Sessions.builder), so the cast is value-preserving and
    *     matches DuckDB's naive-as-UTC read of the same file.
    *   - µs TIMESTAMP (`isAdjustedToUTC=true`): already TimestampType.
    *
    * The µs floor on the ns path is deliberate and mirrored on the oracle side
    * (we only ever emit ts through date_trunc or unix_millis).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val df = load(s, d, "events")
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val withTs = df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => df
      case other =>
        throw new IllegalStateException(
          s"events.ts has unsupported type $other — extend Tables.events " +
            "(expected ns-as-long, TIMESTAMP_NTZ, or TIMESTAMP)")
    }
    // numeric width insurance, same rationale as the ts branches (see
    // widenNumerics)
    widenNumerics(withTs,
      "event_id" -> "long", "user_id" -> "long", "value" -> "double")
  }
}
