package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ingest.OtlpFlatten

/** The native +Inf-pad expression must be bit-identical to the HOF reference
  * shape, including zip_with's pad-with-null length semantics. */
class InfBucketExprSpec extends SparkSpec {

  test("native == HOF on events-derived bounds/counts, incl. ragged lengths") {
    import graft.metrics.EventsMetrics
    val df = EventsMetrics.fromEvents(spark, Sf).select(
      array(lit(0.1), lit(1.0), lit(10.0)).as("bounds"),
      // ragged: user-dependent count-array length exercises both pad arms
      slice(array((col("user_id") % 3).cast("long"), (col("user_id") % 5).cast("long"),
        (col("user_id") % 7).cast("long"), (col("user_id") % 11).cast("long"),
        (col("user_id") % 13).cast("long")),
        lit(1), (col("user_id") % 3 + 3).cast("int")).as("counts"))
    val diff = df.select(
        OtlpFlatten.withInfBucket(col("bounds"), col("counts")).as("native"),
        OtlpFlatten.withInfBucketHof(col("bounds"), col("counts")).as("hof"))
      .filter(not(col("native") <=> col("hof")))
    assert(diff.count() === 0)
  }

  test("wire shape: N bounds + N+1 counts ends with the +Inf bucket") {
    val r = spark.range(1).select(
        OtlpFlatten.withInfBucket(
          array(lit(0.5), lit(2.5)),
          array(lit(1L), lit(2L), lit(3L))).as("b"))
      .selectExpr("b[2].le as le", "b[2].count as c", "size(b) as n")
      .collect()(0)
    assert(r.getDouble(0).isPosInfinity)
    assert(r.getLong(1) === 3L)
    assert(r.getInt(2) === 3)
  }
}
