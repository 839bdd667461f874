package graft

import org.apache.spark.sql.SparkSession

/** Releases every cached artifact a query left behind in the session.
  *
  * Query builders may `persist()` a DataFrame that feeds multiple DAG
  * branches (q_clean_pipeline's `kept`), and [[graft.llm.Dedup.components]]
  * materializes per-round `localCheckpoint` blocks; both live until the
  * SparkSession stops unless released. Verify/Bench run 50+ queries in one
  * session, so without a release point those blocks accumulate across
  * queries (and across Bench's repeat timings), competing with shuffle and
  * execution memory. The harnesses call this after materializing each query.
  */
object CacheHygiene {
  /** Unpersist everything: Dataset-level cache entries AND raw persistent
    * RDDs (`localCheckpoint` storage lives at the RDD layer, which
    * `Catalog.clearCache` does not cover). `blocking = true` waits for block
    * removal — specs use it to assert the post-state deterministically. */
  def releaseAll(spark: SparkSession, blocking: Boolean = false): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = blocking))
  }

  /** Unpersist ONE localCheckpoint'ed DataFrame's blocks (its analyzed
    * plan is a LogicalRDD over the persisted RDD) — the per-round release
    * for iterative loops (BPE merge training, connected components):
    * once round N's checkpoint materializes, round N−1's blocks are dead
    * weight that would otherwise grow storage linearly with rounds (r14
    * ADVICE). Safe only when nothing will recompute the superseded plan —
    * a locally-checkpointed RDD's lineage is truncated. */
  def unpersistCheckpoint(df: org.apache.spark.sql.DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
