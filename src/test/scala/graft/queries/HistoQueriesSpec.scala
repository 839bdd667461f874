package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.Tables

/** A15's scale-path claim: `percentile_approx` (a mergeable KLL-style
  * sketch — the only viable quantile at 100 TB) must track the exact
  * `percentile` the registered query uses for its oracle. */
class HistoQueriesSpec extends SparkSpec {

  test("A15: percentile_approx tracks exact percentile per group") {
    val rows = Tables.lineitem(spark, Sf)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, array(0.5D, 0.95D, 0.99D))").as("exact"),
        expr("percentile_approx(l_quantity, array(0.5D, 0.95D, 0.99D), 10000)")
          .as("approx"))
      .select(col("l_returnflag"), col("exact"), col("approx"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getSeq[Double](1)
      val approx = r.getSeq[Double](2)
      exact.zip(approx).zipWithIndex.foreach { case ((e, a), i) =>
        // l_quantity is small-integer-valued; at accuracy 10000 the sketch
        // must land within one quantity unit of the exact answer
        assert(math.abs(e - a) <= 1.0,
          s"flag ${r.getString(0)} q$i: exact $e vs approx $a")
      }
    }
  }
}
