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
}
