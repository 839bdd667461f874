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
}
