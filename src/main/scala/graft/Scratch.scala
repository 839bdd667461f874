package graft

import org.apache.spark.sql.functions._

/** Dev probe — timing decomposition for hot queries. Not part of the library. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import graft.llm.Dedup
    import graft.model.Tables

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    // q_a12 decomposition
    import graft.histo.HistogramFunctions
    
    val q = graft.SparkEntry.queries("q_a12_exp_merge")
    def log2F(v: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      (length(bin(floor(v).cast("long"))) - 1).cast("int")
    val idx = when(col("l_linestatus") === "O",
        (length(bin(floor(col("l_extendedprice") * col("l_extendedprice")).cast("long"))) - 1).cast("int"))
      .otherwise(log2F(col("l_extendedprice")))
    val pr = Tables.lineitem(spark, d)
      .select(col("l_returnflag").as("flag"), col("l_linestatus").as("ls"),
        when(col("l_linestatus") === "O", 1).otherwise(0).as("scale"), idx.as("idx"))
    time("a12 scan+idx")(pr.write.format("noop").mode("overwrite").save())
    val g1 = pr.groupBy(col("flag"), col("ls"), col("scale"), col("idx"))
      .agg(count(lit(1)).as("count"))
    time("a12 group1")(g1.write.format("noop").mode("overwrite").save())
    time("a12 full")(q(spark, d).write.format("noop").mode("overwrite").save())

    // q_s4 decomposition
    val q4 = graft.SparkEntry.queries("q_s4_exemplars")
    time("s4 full")(q4(spark, d).write.format("noop").mode("overwrite").save())
    val q3 = graft.SparkEntry.queries("q_s3_per_type")
    time("s3 full")(q3(spark, d).write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
