package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Greedy next-fit packing: budget sealing, oversized docs, per-shard
  * independence, determinism. */
class PackingSpec extends SparkSpec {

  private def pack(rows: Seq[(Long, Long, Long)], max: Long): Map[Long, (Long, Long)] = {
    val s = spark
    import s.implicits._
    val df = rows.toDF("doc_id", "shard", "sz")
    Packing.packNextFit(df, col("doc_id"), col("shard"), col("doc_id"),
        col("sz"), max)
      .collect().map(r => r.getLong(1) -> (r.getLong(0), r.getLong(2))).toMap
  }

  test("seals packs at the budget; oversized doc gets its own pack") {
    // shard 0, max 10: sizes 4,4,4 → packs 0,0,1; then 25 (oversized) → 2;
    // then 3 → 3 (next-fit never reuses a sealed pack)
    val got = pack(Seq(
      (1L, 0L, 4L), (2L, 0L, 4L), (3L, 0L, 4L), (4L, 0L, 25L), (5L, 0L, 3L)),
      max = 10)
    assert(got === Map(
      1L -> (0L, 0L), 2L -> (0L, 0L), 3L -> (0L, 1L),
      4L -> (0L, 2L), 5L -> (0L, 3L)))
  }

  test("shards pack independently") {
    val got = pack(Seq((1L, 0L, 9L), (2L, 1L, 9L), (3L, 0L, 9L), (4L, 1L, 1L)),
      max = 10)
    assert(got === Map(
      1L -> (0L, 0L), 3L -> (0L, 1L), // shard 0: 9 then 9 overflows
      2L -> (1L, 0L), 4L -> (1L, 0L))) // shard 1: 9 + 1 fits
  }
}
