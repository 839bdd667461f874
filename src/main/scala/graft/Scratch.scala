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

    Seq("q_dedup_minhash", "q_dedup_jaccard", "q_dedup_simhash").foreach { n =>
      val q = graft.SparkEntry.queries(n)
      time(s"$n warm0")(q(spark, d).write.format("noop").mode("overwrite").save())
      time(s"$n warm1")(q(spark, d).write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
