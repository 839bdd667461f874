package graft

import org.apache.spark.sql.SparkSession

/** Dev scratchpad — not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = graft.model.Tables.events(spark, "/root/testdata/sf0.001")
    ev.printSchema()
    ev.show(3, truncate = false)
    spark.stop()
  }
}
