package graft.query

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.Tables

/** RangeSort.projectSorted must produce exactly an orderBy's total order
  * (partition-concatenation order) while keeping ONE exchange in the plan. */
class RangeSortSpec extends SparkSpec {

  private def events = Tables.events(spark, Sf)
    .select(col("event_id"), col("user_id"), col("value"))

  test("same-keys form: identical total order to orderBy after coalesce(1)") {
    val heavy = (df: org.apache.spark.sql.DataFrame) =>
      df.select(col("event_id"), (col("value") * 2).as("v2"))
    val viaSort = heavy(events).orderBy(col("event_id"))
      .coalesce(1).collect().toSeq
    val viaRange = RangeSort.projectSorted(events, Seq(col("event_id")))(heavy)
      .coalesce(1).collect().toSeq
    assert(viaRange === viaSort)
  }

  test("prefix form with a window: series-major total order, one exchange") {
    val part = Seq(col("user_id"))
    val sort = Seq(col("user_id"), col("event_id"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    val heavy = (df: org.apache.spark.sql.DataFrame) =>
      df.select(col("user_id"), col("event_id"),
        lag(col("value"), 1).over(w).as("prev"))
    val ranged = RangeSort.projectSorted(events, part, sort)(heavy)
    val expected = heavy(events).orderBy(sort: _*).coalesce(1).collect().toSeq
    assert(ranged.coalesce(1).collect().toSeq === expected)
    // the range exchange doubles as the window's clustering: exactly one
    // exchange, and no second sort above the window's
    val plan = ranged.queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges === 1, s"expected 1 exchange, plan:\n$plan")
  }
}
