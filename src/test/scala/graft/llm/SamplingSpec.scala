package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SamplingSpec extends SparkSpec {

  test("caps each group at k, deterministically, uniform-ish across the range") {
    val s = spark
    import s.implicits._
    val df = (0L until 1000L).map(i => (i % 3, i)).toDF("domain", "doc_id")
    val once = Sampling.topKPerGroup(df, col("domain"), col("doc_id"), 50)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val twice = Sampling.topKPerGroup(df, col("domain"), col("doc_id"), 50)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(once === twice)
    assert(once.groupBy(_._1).values.forall(_.size === 50))
    // the scramble must not just take a prefix of the id range: the sampled
    // ids should span it (crude uniformity check)
    val ids = once.map(_._2)
    assert(ids.count(_ < 500) > 30 && ids.count(_ >= 500) > 30)
  }

  test("mixture honors per-group quotas and drops unlisted groups") {
    val s = spark
    import s.implicits._
    val df = (0L until 400L).map(i => (s"g${i % 4}", i)).toDF("src", "doc_id")
    val out = Sampling.mixture(df, col("src"), col("doc_id"),
        Map("g0" -> 0.5, "g1" -> 0.25, "g3" -> 0.003), total = 40)
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    // floor(0.5*40)=20, floor(0.25*40)=10; g2 unlisted and g3's quota
    // rounds to zero — both absent entirely
    assert(out.groupBy(_._1).view.mapValues(_.size).toMap ===
      Map("g0" -> 20, "g1" -> 10))

    // each group's sample equals the same-cap topKPerGroup choice — the
    // mixture is the capped sample under per-group caps, not a new order
    val top20 = Sampling.topKPerGroup(df.filter(col("src") === "g0"),
        col("src"), col("doc_id"), 20)
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    assert(out.filter(_._1 == "g0") === top20)
  }

  test("mixture at corpus-scale quotas equals the whole-group-window reference") {
    val s = spark
    import s.implicits._
    // quotas in the hundreds (≫ any single key-range bucket's share), so the
    // bucket-offset decomposition must stitch ranks across MANY buckets —
    // the regime the r11 single-reducer window died in at scale
    val df = (0L until 6000L).map(i => (s"g${i % 3}", i)).toDF("src", "doc_id")
    val weights = Map("g0" -> 0.5, "g1" -> 0.3, "g2" -> 0.15)
    val out = Sampling.mixture(df, col("src"), col("doc_id"), weights,
        total = 2000, nBuckets = 16)
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("src"))
      .orderBy(Sampling.scrambleKey(col("doc_id")), col("doc_id"))
    val caps = typedLit(weights.view.mapValues(x => math.floor(x * 2000).toLong).toMap)
    val expect = df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= element_at(caps, col("src")))
      .select(col("src"), col("doc_id"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    assert(out === expect)
    assert(out.groupBy(_._1).view.mapValues(_.size).toMap ===
      Map("g0" -> 1000, "g1" -> 600, "g2" -> 300))
  }

  test("bernoulli: deterministic, ~fraction-sized, and nested across fractions") {
    val s = spark
    import s.implicits._
    val df = (0L until 20000L).toDF("doc_id")
    def keep(f: Double): Set[Long] =
      df.filter(Sampling.bernoulli(col("doc_id"), f))
        .collect().map(_.getLong(0)).toSet
    val k10 = keep(0.10)
    assert(keep(0.10) === k10) // reproducible
    // binomial(20000, 0.1): mean 2000, σ≈42 — a ±5σ band
    assert(math.abs(k10.size - 2000) < 220, s"kept ${k10.size} of 20000 at 10%")
    // threshold sampling nests: a smaller fraction is a SUBSET of a larger
    // one (grow a sample without resampling the corpus)
    assert(keep(0.02).subsetOf(k10) && k10.subsetOf(keep(0.5)))
    assert(keep(0.0).isEmpty && keep(1.0).size === 20000)
  }

  test("splitLabel partitions the corpus; train equals bernoulli(0.8)") {
    val s = spark
    import s.implicits._
    val df = (0L until 20000L).toDF("doc_id")
    val labeled = df.select(col("doc_id"),
        Sampling.splitLabel(col("doc_id"),
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).as("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    // full coverage (fractions sum to 1 → no NULLs), all three present
    assert(labeled.forall(_._2 != null))
    val byLabel = labeled.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byLabel.keySet === Set("train", "val", "test"))
    assert(math.abs(byLabel("train") - 16000) < 600)
    assert(math.abs(byLabel("val") - 2000) < 300)
    // threshold alignment: 'train' IS the bernoulli(0.8) keep set
    val bern = df.filter(Sampling.bernoulli(col("doc_id"), 0.8))
      .collect().map(_.getLong(0)).toSet
    assert(labeled.filter(_._2 == "train").map(_._1).toSet === bern)
    // under-covered fractions leave the remainder NULL
    val partial = df.limit(1000).select(
        Sampling.splitLabel(col("doc_id"), Seq("s" -> 0.25)).as("split"))
      .collect().map(r => Option(r.getString(0)))
    assert(partial.exists(_.isEmpty) && partial.exists(_.contains("s")))
  }

  test("mixture output is invariant under nBuckets (pure plan parameter)") {
    val s = spark
    import s.implicits._
    // nBuckets shapes the physical decomposition only — the selected row
    // set must be byte-identical whichever bucket count runs it (the rank
    // decomposition is exact, not approximate)
    val df = (0L until 3000L).map(i => (s"g${i % 4}", i * 7 + 3)).toDF("src", "doc_id")
    val w = Map("g0" -> 0.4, "g1" -> 0.3, "g3" -> 0.1)
    def run(nb: Int) = Sampling.mixture(df, col("src"), col("doc_id"), w,
        total = 900, nBuckets = nb)
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    val base = run(64)
    assert(run(1) === base)
    assert(run(4) === base)
    assert(run(256) === base)
  }

  test("mixture's executed plan has no whole-group window over unaggregated data") {
    val s = spark
    import s.implicits._
    val df = (0L until 4000L).map(i => (s"g${i % 3}", i)).toDF("src", "doc_id")
    val out = Sampling.mixture(df, col("src"), col("doc_id"),
      Map("g0" -> 0.5, "g1" -> 0.3), total = 2000)
    out.collect()
    val flagged = graft.plans.PlanAudit.wholeGroupWindows(
      out.queryExecution.executedPlan)
    assert(flagged.isEmpty,
      s"corpus-scale single-partition window in mixture plan: $flagged")
    // the auditor itself must still catch the old shape — a row_number over
    // the raw rows partitioned by the group alone
    val old = df.withColumn("__rk", row_number().over(
      org.apache.spark.sql.expressions.Window.partitionBy(col("src"))
        .orderBy(col("doc_id"))))
    old.collect()
    assert(graft.plans.PlanAudit.wholeGroupWindows(
      old.queryExecution.executedPlan).nonEmpty,
      "auditor failed to flag a genuine whole-group window")
  }

  test("shardShuffle: positions equal the whole-shard window reference") {
    val s = spark
    import s.implicits._
    val df = (0L until 5000L).map(i => i * 13 + 5).toDF("doc_id")
    val out = Sampling.shardShuffle(df, col("doc_id"), nShards = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    // reference: the naive whole-shard window (test-only shape)
    val ref = df.withColumn("__key", Sampling.scrambleKey(col("doc_id")))
      .withColumn("shard", shiftright(col("__key"), 29).cast("int"))
      .withColumn("pos", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("shard"))
          .orderBy(col("__key"), col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("shard"), col("pos"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(out === ref)
    // each shard's positions are exactly 1..n — no gaps, no duplicates
    out.groupBy(_._2).foreach { case (shard, rows) =>
      val ps = rows.map(_._3).toSeq.sorted
      assert(ps === (1L to ps.size.toLong), s"shard $shard positions broken")
    }
  }

  test("shardShuffle invariant under nBuckets; no whole-shard window in the plan") {
    val s = spark
    import s.implicits._
    val df = (0L until 3000L).map(i => i * 7 + 3).toDF("doc_id")
    def run(nb: Int) = Sampling.shardShuffle(df, col("doc_id"),
        nShards = 8, nBuckets = nb)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted.toSeq
    val base = run(64)
    assert(run(1) === base)
    assert(run(4) === base)
    assert(run(256) === base) // 8·256 still fits the 32-bit key
    val out = Sampling.shardShuffle(df, col("doc_id"), nShards = 8)
    out.collect()
    val flagged = graft.plans.PlanAudit.wholeGroupWindows(
      out.queryExecution.executedPlan)
    assert(flagged.isEmpty,
      s"corpus-scale single-partition window in shardShuffle plan: $flagged")
  }
}
