package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

/** Executed-plan audits shared by the Scratch probes and the plan-shape
  * regression specs. The central question: how many times does a query's
  * executed TREE physically scan each source path? Textual plan counts
  * over-report (a cached InMemoryRelation prints its interior FileScan;
  * AQE prints stages twice), so these walk the actual node tree, crediting
  * `ReusedExchangeExec` (its child executes elsewhere, once) and following
  * adaptive stages to their executed plans. Duplicate fact-table scans are
  * invisible at test scale and a direct multiplier on 100 TB I/O — q_j2
  * scanned lineitem six times before r11 caught it with this walk. */
object PlanAudit {

  /** All source paths scanned by the executed tree, one entry per physical
    * scan (so a path scanned twice appears twice). The DataFrame must have
    * been EXECUTED first — under AQE the pre-execution tree holds
    * unresolved stages. */
  def scannedPaths(plan: SparkPlan): Seq[String] = {
    val self = plan match {
      case f: FileSourceScanExec =>
        f.relation.location.rootPaths.map(_.toString)
      case a: AdaptiveSparkPlanExec => scannedPaths(a.executedPlan)
      case q: QueryStageExec => scannedPaths(q.plan)
      case _: ReusedExchangeExec => Seq.empty
      case _ => Seq.empty
    }
    self ++ plan.children.flatMap(scannedPaths)
  }

  /** Execute `df` (noop-sink, forcing every column) and return path →
    * physical scan count for every path scanned more than `budget` times. */
  def overBudgetScans(df: DataFrame, budget: Int = 1): Map[String, Int] = {
    val qe = df.queryExecution
    qe.toRdd.foreach(_ => ())
    scannedPaths(qe.executedPlan)
      .groupBy(identity).view.mapValues(_.size)
      .filter(_._2 > budget).toMap
  }
}
