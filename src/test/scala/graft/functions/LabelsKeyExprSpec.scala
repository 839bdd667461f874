package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.metrics.EventsMetrics
import graft.query.Promread

/** The native labels-key expression must be bit-identical to the HOF
  * reference shape — every read-path output row and the oracle SQL's
  * 'k=' || v || ... concatenation depend on the exact rendering. */
class LabelsKeyExprSpec extends SparkSpec {

  test("native labels key == HOF labels key on the events attribute maps") {
    val df = EventsMetrics.withAttributes(EventsMetrics.fromEvents(spark, Sf))
    val diff = df.select(
        Promread.labelsKey(col("attributes")).as("native"),
        Promread.labelsKeyHof(col("attributes")).as("hof"))
      .filter(col("native") =!= col("hof"))
    assert(diff.count() === 0)
  }

  test("edge maps: empty, null value dropped, entry-order sort") {
    val cases = Seq(
      map().cast("map<string,string>"),
      map(lit("b"), lit("2"), lit("a"), lit("1")),
      // one key a prefix of another: sort is by rendered "k=v", not by key
      map(lit("a:"), lit("x"), lit("a"), lit("y")))
    val rows = cases.map { m =>
      spark.range(1)
        .select(Promread.labelsKey(m).as("native"),
          Promread.labelsKeyHof(m).as("hof"))
        .collect()(0)
    }
    rows.foreach(r => assert(r.getString(0) === r.getString(1)))
    assert(rows(0).getString(0) === "")
    assert(rows(1).getString(0) === "a=1,b=2")
    // null value: HOF drops the entry via null concat + array_join skip
    val nulled = spark.range(1)
      .select(Promread.labelsKey(
        map_from_arrays(array(lit("k"), lit("n")),
          array(lit("v"), lit(null).cast("string")))).as("native"))
      .collect()(0).getString(0)
    assert(nulled === "k=v")
  }
}
