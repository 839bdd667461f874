package graft.metrics

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ingest.Validation

/** Pins behaviors the oracle queries can't see: F9 hash determinism under
  * attribute insertion order, last-wins duplicate-bound bucket deltas, and the
  * null-type validation edge. */
class MetricsOpsSpec extends SparkSpec {

  test("F9: seriesHash is invariant to attribute map insertion order") {
    import spark.implicits._
    val df = Seq(1).toDF("x").select(
      EventsMetrics.seriesHash(lit("m"), lit("ws"),
        map(lit("a"), lit("1"), lit("b"), lit("2"), lit("c"), lit("3"))).as("h1"),
      EventsMetrics.seriesHash(lit("m"), lit("ws"),
        map(lit("c"), lit("3"), lit("a"), lit("1"), lit("b"), lit("2"))).as("h2"))
    val row = df.head()
    assert(row.getLong(0) == row.getLong(1), "hash depends on attribute order")
  }

  test("F9: different label values hash differently") {
    import spark.implicits._
    val row = Seq(1).toDF("x").select(
      EventsMetrics.seriesHash(lit("m"), lit("ws"), map(lit("a"), lit("1"))).as("h1"),
      EventsMetrics.seriesHash(lit("m"), lit("ws"), map(lit("a"), lit("2"))).as("h2")).head()
    assert(row.getLong(0) != row.getLong(1))
  }

  test("J2: deltaBuckets subtracts prev count at same bound; missing bound passes raw") {
    import spark.implicits._
    val df = Seq(
      (Seq((0.5, 10L), (1.0, 25L), (2.0, 40L)), Some(Seq((0.5, 4L), (2.0, 15L))), false))
      .toDF("raw_b", "raw_p", "reset")
      .select(
        expr("transform(raw_b, x -> struct(x._1 as le, x._2 as count))").as("b"),
        expr("transform(raw_p, x -> struct(x._1 as le, x._2 as count))").as("p"),
        col("reset"))
    val out = df.select(Temporality.deltaBuckets(col("b"), col("p"), col("reset")).as("d"))
      .selectExpr("transform(d, x -> x.count) as counts").head().getSeq[Long](0)
    assert(out == Seq(6L, 25L, 25L)) // 10-4, 25-0 (bound absent), 40-15
  }

  test("J2: duplicate le bounds in the previous snapshot are last-wins (no throw)") {
    import spark.implicits._
    val df = Seq(
      (Seq((1.0, 50L)), Some(Seq((1.0, 10L), (1.0, 30L))), false))
      .toDF("raw_b", "raw_p", "reset")
      .select(
        expr("transform(raw_b, x -> struct(x._1 as le, x._2 as count))").as("b"),
        expr("transform(raw_p, x -> struct(x._1 as le, x._2 as count))").as("p"),
        col("reset"))
    val out = df.select(Temporality.deltaBuckets(col("b"), col("p"), col("reset")).as("d"))
      .selectExpr("transform(d, x -> x.count) as counts").head().getSeq[Long](0)
    assert(out == Seq(20L)) // 50 - 30 (last duplicate wins, Go map semantics)
  }

  test("P1: NULL metric_type rejects as unknown_type (reference switch default)") {
    import spark.implicits._
    val out = Seq(1).toDF("x").select(
      Validation.rejectReason(
        lit("name"), lit(graft.queries.OracleDefs.NowMs), lit(null).cast("string"),
        lit(1.0), lit(null).cast("long"), lit(null).cast("double"),
        lit(null).cast("array<struct<le:double,count:bigint>>"),
        graft.queries.OracleDefs.NowMs).as("r")).head().getString(0)
    assert(out == Validation.ReasonUnknownType)
  }

  test("S4: capExemplars disabled branch keeps the full exemplar schema") {
    import spark.implicits._
    val enabled = Seq(1).toDF("x")
      .select(Validation.capExemplars(
        lit(null).cast(org.apache.spark.sql.types.ArrayType(graft.model.Schemas.exemplarType)),
        enabled = true).as("e"))
    val disabled = Seq(1).toDF("x")
      .select(Validation.capExemplars(lit(null), enabled = false).as("e"))
    assert(enabled.schema("e").dataType == disabled.schema("e").dataType,
      "capExemplars branches return different types")
  }
}
