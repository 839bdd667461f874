package graft

/** The harness cache-release contract (VERDICT r6 #5): q_clean_pipeline
  * persists its `kept` branch point and Dedup.components materializes
  * localCheckpoint blocks per round — all of it must be releasable so the
  * 50+-query Verify/Bench session never accumulates dead blocks. */
class CacheHygieneSpec extends SparkSpec {

  test("q_clean_pipeline leaves no cached RDDs after releaseAll") {
    val df = SparkEntry.queries("q_clean_pipeline")(spark, Sf)
    assert(df.count() > 0) // materialize — fills kept's cache + checkpoints
    // the leak exists before release (persist + per-round checkpoints)...
    assert(spark.sparkContext.getPersistentRDDs.nonEmpty)
    CacheHygiene.releaseAll(spark, blocking = true)
    // ...and nothing survives it: no DataFrame cache, no RDD blocks
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }

  test("releaseAll on a clean session is a no-op") {
    CacheHygiene.releaseAll(spark, blocking = true)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }
}
