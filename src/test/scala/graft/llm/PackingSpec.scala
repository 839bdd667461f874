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

  // ---- overlapping token-window chunking ----

  private def chunks(text: String, size: Int, overlap: Int): Seq[(Long, Long, Long)] = {
    val s = spark
    import s.implicits._
    Packing.chunkTokens(Seq((1L, text)).toDF("doc_id", "text"),
        org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"), size, overlap)
      .orderBy("chunk_idx")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
  }

  test("chunkTokens: counts, coverage, and stride reconstruction") {
    // 10 tokens, size 4, overlap 1 → stride 3 → 1+ceil(6/3)=3 chunks
    val toks = (1 to 10).map(i => s"t$i")
    val got = chunks(toks.mkString(" "), size = 4, overlap = 1)
    assert(got.map(_._1) === Seq(0L, 1L, 2L))
    assert(got.map(_._2) === Seq(4L, 4L, 4L)) // windows at 1..4, 4..7, 7..10
    // reconstruction: stride-prefix of each chunk + the final chunk's tail
    // re-covers the token stream exactly once
    val starts = got.map(_._1 * 3).map(_.toInt)
    val covered = starts.zip(got.map(_._2.toInt)).flatMap { case (st, len) =>
      (st until st + len) }.toSet
    assert(covered === (0 until 10).toSet, "every token in ≥1 chunk")

    // short doc: single chunk, never empty
    assert(chunks("a b", size = 4, overlap = 1) === Seq((0L, 2L, 3L)))

    // boundary: n == size → exactly one chunk
    assert(chunks(toks.take(4).mkString(" "), 4, 1).map(_._1) === Seq(0L))

    // last chunk runs short but is never empty: 11 tokens, stride 3 →
    // 1+ceil(7/3)=4 chunks, last covers tokens 10..11
    val g11 = chunks((1 to 11).map(i => s"t$i").mkString(" "), 4, 1)
    assert(g11.map(_._1) === Seq(0L, 1L, 2L, 3L))
    assert(g11.last._2 === 2L)
  }

  test("chunkTokens fuzz: coverage and bounds hold for random docs") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 40) {
      val n = 1 + rnd.nextInt(60)
      val size = 2 + rnd.nextInt(8)
      val overlap = rnd.nextInt(size - 1)
      val stride = size - overlap
      val got = chunks((1 to n).map(i => s"w$i").mkString(" "), size, overlap)
      val expChunks = if (n <= size) 1 else 1 + ((n - size) + stride - 1) / stride
      assert(got.size === expChunks, s"n=$n size=$size overlap=$overlap")
      assert(got.forall(c => c._2 >= 1 && c._2 <= size), "chunk sizes bounded")
      val covered = got.flatMap { case (idx, len, _) =>
        (idx * stride until idx * stride + len) }.toSet
      assert(covered === (0L until n.toLong).toSet, "full coverage")
    }
  }
}
