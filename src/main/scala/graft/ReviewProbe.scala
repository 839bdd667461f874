package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.histo.HistogramFunctions._
import graft.histo.HistogramMath

object ReviewProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val df = Seq(
      ("a", Seq((0.005, 100L), (0.01, 200L), (0.025, 300L), (0.05, 200L), (0.1, 150L), (0.25, 30L), (0.5, 15L), (1.0, 5L), (Double.PositiveInfinity, 0L))),
      ("b", Seq.empty[(Double, Long)])
    ).toDF("k", "raw")
      .withColumn("buckets", expr("transform(raw, x -> struct(x._1 as le, x._2 as count))"))

    val out = df.select($"k",
      histogram_quantile($"buckets", lit(50.0)).as("p50"),
      histogram_quantiles($"buckets", array(lit(50.0), lit(95.0))).as("ps"),
      buckets_to_cumulative($"buckets").as("cum"))
    out.show(truncate = false)

    val merged = mergeBuckets(df, Seq($"k"), $"buckets")
    merged.show(truncate = false)

    val eh = Seq(
      HistogramMath.ExpHist(2, 1L, 0.001, Seq(graft.model.ExpBucket(4, 8), graft.model.ExpBucket(5, 4)), Nil),
      HistogramMath.ExpHist(0, 2L, 0.01, Seq(graft.model.ExpBucket(1, 3)), Nil)
    ).toDF("scale", "zeroCount", "zeroThreshold", "positive", "negative")
    // exercise exp quantile udf
    val eq = eh.select(exp_histogram_quantile($"scale", $"zeroCount", $"positive", $"negative", lit(50.0)).as("q"))
    eq.show(truncate = false)
    // exercise udaf
    val ag = eh.groupBy(lit(1)).agg(merge_exp_hist($"scale", $"zeroCount", $"zeroThreshold", $"positive", $"negative").as("m"))
    ag.show(truncate = false)
    spark.stop()
  }
}
