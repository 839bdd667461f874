package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.histo.HistogramFunctions

/** The native histogram expressions must be output-identical to the Scala-UDF
  * reference bindings kept in [[graft.histo.HistogramFunctions]] — both call
  * the same pure math, so the pin is over the binding layer (null handling,
  * ArrayData conversion, error arms). */
class HistogramExprsSpec extends SparkSpec {

  private def buckets = array(
    struct(lit(0.1).as("le"), lit(10L).as("count")),
    struct(lit(1.0).as("le"), lit(30L).as("count")),
    struct(lit(Double.PositiveInfinity).as("le"), lit(5L).as("count")))

  test("expr == UDF bindings for quantile / quantiles / delta<->cumulative") {
    val r = spark.range(1).select(
        HistogramExprs.histogram_quantile(buckets, lit(50.0)).as("q_e"),
        HistogramFunctions.histogramQuantileUdf(buckets, lit(50.0)).as("q_u"),
        HistogramExprs.histogram_quantiles(buckets, array(lit(50.0), lit(95.0)))
          .as("qs_e"),
        HistogramFunctions.histogramQuantilesUdf(
          buckets, array(lit(50.0), lit(95.0))).as("qs_u"),
        HistogramExprs.buckets_to_cumulative(buckets).as("c_e"),
        HistogramFunctions.bucketsToCumulativeUdf(buckets).as("c_u"))
      .collect()(0)
    assert(r.getDouble(0) === r.getDouble(1))
    assert(r.getSeq[Double](2) === r.getSeq[Double](3))
    assert(r.getSeq[org.apache.spark.sql.Row](4) ===
      r.getSeq[org.apache.spark.sql.Row](5))
  }

  test("error arms are NULL: bad p, and a null entry in the percentile array") {
    val r = spark.range(1).select(
        HistogramExprs.histogram_quantile(buckets, lit(150.0)).as("bad_p"),
        HistogramExprs.histogram_quantiles(
          buckets, array(lit(50.0), lit(null).cast("double"))).as("null_ps"))
      .collect()(0)
    assert(r.isNullAt(0))
    assert(r.isNullAt(1)) // a null p entry is an error, not a silent 0.0
  }
}
