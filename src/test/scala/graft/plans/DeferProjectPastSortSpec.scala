package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.{Project, Sort}
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.Tables

/** The injected optimizer rule must pull expensive projections above global
  * sorts (so the range-sampling pass stops re-executing them), leave
  * computed-key sorts alone, and never change results. */
class DeferProjectPastSortSpec extends SparkSpec {

  private def events = Tables.events(spark, Sf)
    .select(col("event_id"), col("user_id"), col("value"))

  test("expensive projection is deferred: Project lands above the Sort") {
    val q = events
      .select(col("event_id"), sha2(concat_ws(",", col("value")), 256).as("h"))
      .orderBy(col("event_id"))
    val optimized = q.queryExecution.optimizedPlan
    // topmost sort-bearing shape must be Project(Sort(...)), not Sort(Project)
    val deferred = optimized match {
      case Project(_, _: Sort) => true
      case _ => false
    }
    assert(deferred, s"rule did not fire:\n$optimized")
    // and the result is still totally ordered by event_id
    val ids = q.coalesce(1).collect().map(_.getLong(0)).toSeq
    assert(ids === ids.sorted)
  }

  test("sort on a COMPUTED alias is not deferred (keys need the projection)") {
    val q = events
      .select(col("event_id"), sha2(concat_ws(",", col("value")), 256).as("h"))
      .orderBy(col("h"))
    val optimized = q.queryExecution.optimizedPlan
    val stillSortOnTop = optimized.isInstanceOf[Sort]
    assert(stillSortOnTop, s"unexpected rewrite:\n$optimized")
  }

  test("trivial projections stay put — no gratuitous rewrites") {
    val q = events.select(col("event_id"), col("value"))
      .orderBy(col("event_id"))
    val optimized = q.queryExecution.optimizedPlan
    assert(optimized.isInstanceOf[Sort], s"unexpected rewrite:\n$optimized")
  }
}
