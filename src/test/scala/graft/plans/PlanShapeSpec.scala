package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.metrics.EventsMetrics
import graft.model.Tables

/** Plan-shape regression guards for the properties the engine's 100 TB story
  * rests on. Correctness specs prove WHAT each operator returns; these pin
  * HOW Spark executes the hot paths — filter pushdown reaching the parquet
  * reader, column pruning in the scan schema, broadcast (not shuffle) joins
  * for dimension lookups, and whole-stage codegen over the per-row operator
  * family. A refactor that silently turns a pruned broadcast plan into a
  * full-scan shuffle join would pass every value assertion and still be a
  * 100× regression at scale; this suite makes that failure loud.
  */
class PlanShapeSpec extends SparkSpec {

  private def executedPlan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("promread time+metric predicates push into the events parquet scan") {
    val lo = 1000000000000L
    val df = EventsMetrics.fromEvents(spark, Sf)
      .filter(col("ts_ms") >= lo && col("event_type") === "click")
      .select("workspace_id", "metric", "ts_ms", "value")
    val plan = executedPlan(df)
    // event_type is a raw column: its predicate must reach the reader as a
    // pushed filter, not evaluate post-scan only
    assert(plan.contains("PushedFilters: ["),
      s"no pushed filters in scan:\n$plan")
    assert(plan.matches("(?s).*PushedFilters: \\[[^\\]]*event_type[^\\]]*\\].*"),
      s"event_type predicate not pushed to parquet:\n$plan")
  }

  test("projection prunes the events scan schema to consumed columns") {
    val df = EventsMetrics.fromEvents(spark, Sf)
      .select("ts_ms", "value")
    val plan = executedPlan(df)
    // ReadSchema must carry only the source columns the projection needs
    // (ts, value) — props/event_type/user_id/event_id pruned at the reader
    val read = "ReadSchema: [^\\n]*".r.findFirstIn(plan).getOrElse("")
    assert(read.nonEmpty, s"no ReadSchema in plan:\n$plan")
    assert(!read.contains("props"), s"props not pruned: $read")
    assert(!read.contains("event_id"), s"event_id not pruned: $read")
  }

  test("dimension join broadcasts the small side (no shuffle of the fact)") {
    val li = Tables.lineitem(spark, Sf)
    val supp = Tables.supplier(spark, Sf)
    val joined = li.join(supp, li("l_suppkey") === supp("s_suppkey"))
      .groupBy(col("s_nationkey")).agg(sum(col("l_quantity")).as("qty"))
    val plan = executedPlan(joined)
    assert(plan.contains("BroadcastHashJoin"),
      s"dimension join is not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"fact side shuffled for a dimension join:\n$plan")
  }

  test("text-stats hot path stays inside whole-stage codegen") {
    val df = graft.llm.TextAnalysis.withStats(
      Tables.documents(spark, Sf), col("text"),
      graft.queries.OracleDefs.Stopwords)
    val plan = executedPlan(df)
    // the compact plan string marks whole-stage-codegen stages with a `*(N)`
    // prefix; the stats projection (token_stats over the split) must carry it
    val statsLine = plan.linesIterator
      .find(_.contains("token_stats")).getOrElse("")
    assert(statsLine.contains("*("),
      s"per-row stats fell out of codegen:\n$plan")
    // and nothing between the scan and the stats stage broke the span:
    // every Project in this plan should be starred
    val unstarred = plan.linesIterator
      .filter(_.contains("Project")).filterNot(_.contains("*("))
    assert(unstarred.isEmpty,
      s"projection outside codegen: ${unstarred.mkString("; ")}")
  }

  test("langid scoring stays inside whole-stage codegen at scan speed") {
    val df = Tables.documents(spark, Sf)
      .select(col("doc_id"),
        graft.llm.LangId.scores(graft.llm.LangId.padded(col("text"))).as("sc"))
    val plan = executedPlan(df)
    val scoreLine = plan.linesIterator
      .find(_.contains("langid_scores")).getOrElse("")
    assert(scoreLine.contains("*("),
      s"langid scoring fell out of codegen:\n$plan")
    // and no shuffle: language ID is a pure per-row projection
    assert(!plan.contains("Exchange"),
      s"langid projection introduced a shuffle:\n$plan")
  }

  test("bernoulli sampling and split labeling are scan-only (zero exchanges)") {
    // the whole point of the threshold samplers: a corpus cut/split costs
    // one scan, no shuffle — a refactor that sneaks an exchange in breaks
    // their 100 TB contract
    val docs = Tables.documents(spark, Sf)
    val sampled = docs.filter(
      graft.llm.Sampling.bernoulli(col("doc_id"), 0.1))
      .select(col("doc_id"))
    assert(!executedPlan(sampled).contains("Exchange"),
      s"bernoulli filter shuffled:\n${executedPlan(sampled)}")
    val labeled = docs.select(col("doc_id"),
      graft.llm.Sampling.splitLabel(col("doc_id"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).as("split"))
    assert(!executedPlan(labeled).contains("Exchange"),
      s"split labeling shuffled:\n${executedPlan(labeled)}")
  }

  test("date-range predicate prunes the sink's partition directories") {
    import graft.sink.MetricsSink
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_prune").toString
    val day = 86400000L
    // three UTC days of rows; the read wants only the middle one
    val rows = (0 until 3).flatMap(d => (0 until 10).map(i =>
      (d * day + i * 3600000L, s"ws-$d", i.toDouble)))
      .toDF("ts_ms", "workspace_id", "value")
    MetricsSink.write(rows, base, MetricsSink.Raw, col("ts_ms"),
      Seq(col("workspace_id")), mode = "overwrite")
    val pruned = MetricsSink.read(spark, base, MetricsSink.Raw)
      .filter(MetricsSink.partitionFilter(MetricsSink.Raw, day, 2 * day - 1))
    val plan = executedPlan(pruned)
    assert(plan.matches("(?s).*PartitionFilters: \\[[^\\]]*p_date[^\\]]*\\].*"),
      s"p_date predicate did not become a partition filter:\n$plan")
    // and the pruning is real, not just planned: the executed scan touches
    // exactly the middle day's files (inputFiles would NOT show this — it
    // reports the relation's full file set, pre-pruning)
    pruned.collect()
    val scan = pruned.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.getOrElse(fail(s"no file scan in plan:\n$plan"))
    val day2Files = new java.io.File(s"$base/metrics_raw/p_date=1970-01-02")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(day2Files > 0)
    assert(scan.metrics("numFiles").value == day2Files,
      s"scan read ${scan.metrics("numFiles").value} files, " +
        s"the pruned partition holds $day2Files")
  }

  test("rollup aggregation is partial (map-side combine before the exchange)") {
    val df = EventsMetrics.fromEvents(spark, Sf)
      .groupBy(col("workspace_id"), col("metric"))
      .agg(sum(col("value")).as("total"))
    val plan = executedPlan(df)
    // HashAggregate(partial) → Exchange → HashAggregate(final): the partial
    // stage must appear BELOW the exchange so 100 TB of rows combine before
    // the shuffle, not after
    val idxPartial = plan.indexOf("partial_sum")
    val idxExchange = plan.indexOf("Exchange")
    assert(idxPartial >= 0, s"no partial aggregation in plan:\n$plan")
    assert(idxExchange >= 0, s"no exchange in plan:\n$plan")
    assert(idxPartial > idxExchange,
      // plan text prints top-down: the partial agg (executed first) is the
      // DEEPER node, so it must appear AFTER the exchange line in the string
      s"partial agg not below the exchange:\n$plan")
  }
}
