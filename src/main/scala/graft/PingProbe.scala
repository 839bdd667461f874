package graft

object PingProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.builder("local[4]", 4)
      .config("spark.sql.planChangeLog.level", "warn")
      .config("spark.sql.planChangeLog.batches", "Operator Optimization before Inferring Filters")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val name = args.headOption.getOrElse("q_mm_resize")
    SparkEntry.queries(name)(spark, sf).queryExecution.optimizedPlan
    spark.stop()
  }
}
