package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.model.Tables

/** Training export: one file per shard, rows in exact global-shuffle
  * order, byte-stable across re-runs. */
class ExportShardsSpec extends SparkSpec {

  private def listParquet(dir: java.io.File): Seq[java.io.File] =
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).toSeq

  test("exportShards: one file per shard, contiguous in-order positions, lossless") {
    val out = Files.createTempDirectory("graft-export").toFile
    val docs = Tables.documents(spark, Sf).select(col("doc_id"), col("text"))
    DocumentsApp.exportShards(docs, col("doc_id"), nShards = 4, out.getPath)

    val shardDirs = Option(out.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("shard=")).toSeq
    assert(shardDirs.map(_.getName).sorted ===
      (0 to 3).map(i => s"shard=$i"))
    shardDirs.foreach { d =>
      assert(listParquet(d).size === 1, s"${d.getName} must hold ONE file")
    }

    // read each shard file alone: in-file row order must equal pos order,
    // positions contiguous from 1
    shardDirs.foreach { d =>
      val rows = spark.read.parquet(listParquet(d).head.getPath)
        .select(col("pos")).collect().map(_.getLong(0)).toSeq
      assert(rows === (1L to rows.length), s"${d.getName} order/contiguity")
    }

    // lossless: the shard union carries exactly the corpus ids
    val exported = spark.read.parquet(out.getPath)
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted.toSeq
    val corpus = docs.select(col("doc_id")).collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(exported === corpus)

    // determinism: a re-export yields the identical (shard, pos, doc_id) map
    val first = spark.read.parquet(out.getPath)
      .select(col("shard"), col("pos"), col("doc_id"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    DocumentsApp.exportShards(docs, col("doc_id"), nShards = 4, out.getPath)
    val second = spark.read.parquet(out.getPath)
      .select(col("shard"), col("pos"), col("doc_id"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(first === second)
  }

  test("exportTokenShards: ids ride the same export, deterministic across runs") {
    val out = Files.createTempDirectory("graft-export-ids").toFile
    val docs = Tables.documents(spark, Sf).select(col("doc_id"), col("text"))
    val merges = graft.llm.Bpe.trainMerges(docs, col("text"), rounds = 3)
      .orderBy(col("merge_rank")).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val vocab = graft.llm.Bpe.idVocab(docs, col("text"), merges)
    DocumentsApp.exportTokenShards(docs, col("doc_id"), col("text"),
      nShards = 4, out.getPath, merges, vocab)
    // every exported row's ids == a direct tokenize of its text (the
    // export column is the same expression, not a copy that can drift)
    val exported = spark.read.parquet(out.getPath)
      .select(col("doc_id"), col("text"), col("ids"))
    val direct = docs.select(col("doc_id").as("d2"),
      graft.llm.Bpe.tokenizeIds(
        graft.llm.TextAnalysis.tokens(col("text")), merges, vocab).as("ids2"))
    val mismatched = exported.join(direct, col("doc_id") === col("d2"))
      .filter(col("ids") =!= col("ids2")).count()
    assert(mismatched === 0L)
    assert(exported.count() === docs.count())
    // byte-stable: re-export yields the identical (shard, pos, ids-hash) map
    val sig1 = spark.read.parquet(out.getPath)
      .select(col("shard"), col("pos"), xxhash64(col("ids")).as("h"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    DocumentsApp.exportTokenShards(docs, col("doc_id"), col("text"),
      nShards = 4, out.getPath, merges, vocab)
    val sig2 = spark.read.parquet(out.getPath)
      .select(col("shard"), col("pos"), xxhash64(col("ids")).as("h"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(sig1 === sig2)
  }
}
