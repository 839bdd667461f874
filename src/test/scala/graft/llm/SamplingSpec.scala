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
}
