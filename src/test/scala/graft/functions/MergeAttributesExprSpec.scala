package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ingest.OtlpFlatten
import graft.query.Promread

/** The native attribute-merge expression must be bit-identical to the HOF
  * reference shape — datapoint wins on collision, survivor order preserved. */
class MergeAttributesExprSpec extends SparkSpec {

  test("native merge == HOF merge on overlapping maps from events") {
    import graft.metrics.EventsMetrics
    val df = EventsMetrics.fromEvents(spark, Sf).select(
      map(lit("env"), lit("prod"), lit("svc"), col("service_name"),
        lit("user"), lit("resource-level")).as("res"),
      map(lit("env"), lit("stage"), lit("user"), col("user_id").cast("string"))
        .as("dp"))
    // compare through the deterministic rendering (map equality is
    // order-insensitive in Spark, but the rendered key pins entry CONTENT)
    val diff = df.select(
        Promread.labelsKey(OtlpFlatten.mergeAttributes(col("res"), col("dp")))
          .as("native"),
        Promread.labelsKey(OtlpFlatten.mergeAttributesHof(col("res"), col("dp")))
          .as("hof"))
      .filter(col("native") =!= col("hof"))
    assert(diff.count() === 0)
  }

  test("dp wins on collision; disjoint keys union; null map propagates null") {
    val r = spark.range(1).select(
        OtlpFlatten.mergeAttributes(
          map(lit("a"), lit("1"), lit("b"), lit("2")),
          map(lit("b"), lit("X"), lit("c"), lit("3"))).as("m"),
        OtlpFlatten.mergeAttributes(
          lit(null).cast("map<string,string>"),
          map(lit("k"), lit("v"))).as("nullres"))
      .collect()(0)
    assert(r.getMap[String, String](0).toMap === Map("a" -> "1", "b" -> "X", "c" -> "3"))
    assert(r.isNullAt(1))
  }
}
