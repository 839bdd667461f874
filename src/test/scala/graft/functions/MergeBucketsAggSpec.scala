package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.histo.{HistogramFunctions, HistogramMath}
import graft.model.Bucket

/** [[MergeBucketsAgg]] — A9 as one aggregate call. Must equal the pure math
  * ([[HistogramMath.mergeBuckets]], the authoritative port of
  * pkg/histogram/percentile.go:83-105) on every group, keep zero-count
  * entries, skip null arrays, and be deterministic under row order. */
class MergeBucketsAggSpec extends SparkSpec {

  import spark.implicits._

  private def toBuckets(rows: Seq[Row]): Seq[Bucket] =
    rows.map(r => Bucket(r.getDouble(0), r.getLong(1)))

  test("merge across rows equals the pure-math merge, per group") {
    val data = Seq(
      ("a", Seq((0.1, 3L), (1.0, 0L), (10.0, 7L))),
      ("a", Seq((0.1, 2L), (5.0, 4L))),
      ("a", Seq((1.0, 1L))),
      ("b", Seq((0.5, 9L), (Double.PositiveInfinity, 2L))),
      ("b", Seq((0.5, 1L))))
    val df = data.toDF("k", "raw")
      .select(col("k"), expr(
        "transform(raw, x -> named_struct('le', x._1, 'count', x._2))")
        .as("buckets"))
    val got = df.groupBy(col("k"))
      .agg(HistogramFunctions.merge_buckets_agg(col("buckets")).as("m"))
      .collect().map(r => r.getString(0) -> toBuckets(r.getSeq[Row](1))).toMap
    val expect = data.groupBy(_._1).map { case (k, rs) =>
      k -> HistogramMath.mergeBuckets(
        rs.map(_._2.map { case (le, c) => Bucket(le, c) }))
    }
    assert(got === expect)
    // zero-count entries survive the merge (the reference keeps them — an
    // empty target bucket has percentile semantics, percentile.go:47-49)
    assert(got("a").exists(b => b.le == 5.0 && b.count == 4L))
    assert(got.forall { case (_, bs) => bs.map(_.le) == bs.map(_.le).sorted })
  }

  test("null arrays are skipped; order of rows does not matter") {
    val rows = Seq(
      ("a", Some(Seq((0.1, 1L), (1.0, 2L)))),
      ("a", None),
      ("a", Some(Seq((1.0, 5L)))))
    def run(perm: Seq[(String, Option[Seq[(Double, Long)]])]): Seq[Bucket] = {
      val df = perm.toDF("k", "raw")
        .select(col("k"), expr(
          "transform(raw, x -> named_struct('le', x._1, 'count', x._2))")
          .as("buckets"))
      toBuckets(df.groupBy(col("k"))
        .agg(HistogramFunctions.merge_buckets_agg(col("buckets")).as("m"))
        .collect().head.getSeq[Row](1))
    }
    val expected = Seq(Bucket(0.1, 1L), Bucket(1.0, 7L))
    assert(run(rows) === expected)
    assert(run(rows.reverse) === expected)
    assert(run(rows.permutations.drop(2).next()) === expected)
  }

  test("feeds histogram_quantile identically to the two-step merge") {
    val df = Seq(
      ("a", Seq((0.1, 10L), (1.0, 30L), (10.0, 50L), (Double.PositiveInfinity, 10L))),
      ("a", Seq((0.1, 5L), (1.0, 15L), (10.0, 25L), (Double.PositiveInfinity, 5L))))
      .toDF("k", "raw")
      .select(col("k"), expr(
        "transform(raw, x -> named_struct('le', x._1, 'count', x._2))")
        .as("buckets"))
    val oneStep = df.groupBy(col("k"))
      .agg(HistogramFunctions.histogram_quantile(
        HistogramFunctions.merge_buckets_agg(col("buckets")), lit(95.0)).as("p95"))
      .collect().head.getDouble(1)
    val merged = HistogramFunctions.mergeBuckets(
      df.select(col("k"), col("buckets")), Seq(col("k")), col("buckets"))
    val twoStep = merged.select(HistogramFunctions.histogram_quantile(
      col("buckets"), lit(95.0)).as("p95")).collect().head.getDouble(0)
    assert(oneStep === twoStep)
  }
}
