package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Sequence packing for training-data pipelines: assign documents to
  * fixed-token-budget packs (the step between "token counts" and "training
  * shards" — documents are concatenated into ≤ maxTokens sequences).
  *
  * Greedy next-fit per shard, deterministic: walk the shard's documents in
  * (order, id) order with a running token accumulator; when the next document
  * would overflow the budget, seal the pack and start the next. An oversized
  * document (> maxTokens alone) gets its own pack — next-fit never splits
  * documents (chunk first with [[Multimodal.sampleFrames]]-style slicing if
  * splitting is wanted).
  *
  * 100 TB shape: packing is inherently a sequential fold, so the parallel
  * unit is the SHARD — `groupByKey(shard).flatMapGroups` runs one fold per
  * shard, shards run in parallel across executors, and no state leaves them.
  * Choose the shard column so a shard's documents fit one task (e.g.
  * `pmod(doc_id, nShards)` or a date); the fold itself is O(shard rows) with
  * an in-memory sort per group — the same per-group event-time-sort idiom as
  * the streaming converter (ST7).
  */
object Packing {

  def packNextFit(df: DataFrame, id: Column, shard: Column, order: Column,
      size: Column, maxTokens: Long): DataFrame = {
    require(maxTokens > 0, "maxTokens must be positive")
    val prepared = df.select(shard.cast("long").as("shard"),
      order.cast("long").as("ord"), id.cast("long").as("doc_id"),
      size.cast("long").as("sz"))
    val spark = prepared.sparkSession
    import spark.implicits._
    prepared.as[(Long, Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (sh: Long, it: Iterator[(Long, Long, Long, Long)]) =>
        val rows = it.toArray.sortBy(r => (r._2, r._3))
        var acc = 0L
        var pack = 0L
        var first = true
        rows.iterator.map { case (_, _, did, sz) =>
          if (first) { acc = sz; first = false }
          else if (acc + sz > maxTokens) { pack += 1L; acc = sz }
          else acc += sz
          (sh, did, pack)
        }
      }
      .toDF("shard", "doc_id", "pack_id")
  }

  /** Overlapping token-window chunking — the complementary half of
    * [[packNextFit]]'s "never splits documents" contract: documents longer
    * than the context window are cut into `size`-token chunks advancing by
    * `stride = size − overlap` tokens, so every token of the original
    * appears in at least one chunk and consecutive chunks share `overlap`
    * tokens of context (the standard trainer-prep window, e.g. 32/8).
    *
    * Chunk i covers tokens [i·stride+1, i·stride+size]; a doc emits
    * max(1, 1+⌈(n−size)/stride⌉) chunks — the last chunk is the only one
    * allowed to run short, and it is never empty. Output: (doc_id,
    * chunk_idx, chunk_tokens, chunk_chars).
    *
    * 100 TB shape: one generator explode per row (posexplode of a
    * sequence) feeding a narrow projection — no shuffle, no state; the
    * row multiplier is corpus_tokens/stride, the irreducible output size.
    * Integer arithmetic end-to-end, so the oracle restates it exactly. */
  def chunkTokens(df: DataFrame, id: Column, text: Column,
      size: Int, overlap: Int): DataFrame = {
    require(size > 0 && overlap >= 0 && overlap < size,
      s"need 0 <= overlap < size, got size=$size overlap=$overlap")
    val stride = size - overlap
    val toks = col("__ctoks")
    val n = org.apache.spark.sql.functions.size(toks)
    val nChunks = when(n <= size, lit(1L)).otherwise(
      lit(1L) + ceil((n - size).cast("double") / stride).cast("long"))
    df.select(id.cast("long").as("doc_id"), TextAnalysis.tokens(text).as("__ctoks"))
      .select(col("doc_id"), toks,
        explode(sequence(lit(0L), nChunks - 1)).as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"),
        slice(toks, (col("chunk_idx") * stride + 1).cast("int"), lit(size))
          .as("__sl"))
      .select(col("doc_id"), col("chunk_idx"),
        org.apache.spark.sql.functions.size(col("__sl")).cast("long")
          .as("chunk_tokens"),
        length(concat_ws(" ", col("__sl"))).cast("long").as("chunk_chars"))
  }
}
