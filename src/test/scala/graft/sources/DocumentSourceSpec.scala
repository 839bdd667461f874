package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** JSONL/CSV document ingestion: explicit schema (no inference pass), one
  * parse per line, malformed rows quarantined as raw lines instead of
  * killing the job or vanishing.
  */
class DocumentSourceSpec extends SparkSpec {

  private def writeLines(name: String, lines: Seq[String]): String = {
    val dir = Files.createTempDirectory(s"graft_src_$name")
    Files.write(dir.resolve("part-0.txt"),
      String.join("\n", lines: _*).getBytes("UTF-8"))
    dir.toString
  }

  test("jsonl: clean rows parse to the pinned schema, bad lines quarantine") {
    val path = writeLines("jsonl", Seq(
      """{"doc_id": 1, "text": "alpha beta", "lang": "en", "source": "web", "n_chars": 10}""",
      """{"doc_id": 2, "text": "gamma", "lang": "de", "source": "book", "n_chars": 5}""",
      """{"doc_id": 3 "text": missing-comma}""", // malformed JSON
      """not json at all""",
      """{}""")) // parses but carries no document
    val (clean, bad) = DocumentSource.quarantine(
      DocumentSource.jsonl(spark, path))
    assert(clean.schema == DocumentSource.schema)
    val rows = clean.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(rows.toSeq == Seq((1L, "alpha beta", "en"), (2L, "gamma", "de")))
    val raws = bad.collect().map(_.getString(0)).toSet
    assert(raws.size == 3)
    assert(raws.contains("not json at all"))
    assert(raws.contains("{}"))
  }

  test("jsonl: a partially null row is clean data, not corruption") {
    // null lang is a missing FIELD, not a malformed LINE — it must pass
    val path = writeLines("jsonl_null", Seq(
      """{"doc_id": 7, "text": "t", "source": "web", "n_chars": 1}"""))
    val (clean, bad) = DocumentSource.quarantine(
      DocumentSource.jsonl(spark, path))
    assert(bad.isEmpty)
    val r = clean.head()
    assert(r.getLong(0) == 7L && r.isNullAt(2))
  }

  test("csv and tsv: same contract through from_csv") {
    val path = writeLines("csv", Seq(
      "1,alpha beta,en,web,10",
      "oops,this is not,a,valid,row,too,many,fields",
      "2,gamma,de,book,5"))
    val (clean, bad) = DocumentSource.quarantine(
      DocumentSource.csv(spark, path))
    assert(clean.count() == 2 && bad.count() == 1)

    val tsv = writeLines("tsv", Seq("3\tdelta\ten\tweb\t5"))
    val (tClean, tBad) = DocumentSource.quarantine(
      DocumentSource.csv(spark, tsv, sep = "\t"))
    assert(tBad.isEmpty)
    assert(tClean.head().getString(1) == "delta")
  }

  test("schema evolution and adversarial lines: extra fields parse, junk quarantines") {
    val path = writeLines("evolve", Seq(
      // newer dump with fields our schema doesn't know — must parse clean
      """{"doc_id": 1, "text": "alpha", "lang": "en", "source": "w", "n_chars": 5, "fetched_at": "2026-08-14", "score": 0.9}""",
      // unicode + embedded escaped quotes survive the round
      """{"doc_id": 2, "text": "café \"quoted\" 中文", "lang": "fr", "source": "w", "n_chars": 12}""",
      // wrong TYPE on a required key is corruption, not a silent null doc
      """{"doc_id": "not-a-number", "text": "t", "lang": "en", "source": "w", "n_chars": 1}""",
      // a very long junk line must quarantine, not break the line reader
      "x" * 100000))
    val (clean, bad) = DocumentSource.quarantine(
      DocumentSource.jsonl(spark, path))
    val rows = clean.orderBy("doc_id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(rows(1).getString(1) == "café \"quoted\" 中文")
    assert(bad.count() == 2)
  }

  test("streaming jsonl: files landing across micro-batches parse, quarantine, and dedup") {
    import org.apache.spark.sql.functions.{col, lit, timestamp_millis}
    val landing = Files.createTempDirectory("graft_src_stream")
    def drop(name: String, lines: Seq[String]): Unit = {
      val tmp = Files.createTempFile("graft_drop", ".tmp")
      Files.write(tmp, String.join("\n", lines: _*).getBytes("UTF-8"))
      Files.move(tmp, landing.resolve(name)) // atomic land, like a fetcher
    }
    drop("b1.jsonl", Seq(
      """{"doc_id": 1, "text": "alpha beta", "lang": "en", "source": "w", "n_chars": 10}""",
      """garbage line"""))
    val (clean, _) = DocumentSource.quarantine(
      DocumentSource.jsonlStream(spark, landing.toString))
    // stamp an event time and push through the streaming dedup stage — the
    // full ingest-boundary composition this source exists for
    val deduped = graft.llm.StreamingDedup.dedupExact(
      clean.withColumn("ts", timestamp_millis(col("doc_id") * 1000 + lit(100000L))),
      "ts", "10 seconds")
    val q = deduped.writeStream.format("memory").queryName("src_stream_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      drop("b2.jsonl", Seq(
        """{"doc_id": 2, "text": "alpha  BETA ", "lang": "en", "source": "w", "n_chars": 12}""",
        """{"doc_id": 3, "text": "gamma", "lang": "de", "source": "b", "n_chars": 5}"""))
      q.processAllAvailable()
      val out = spark.table("src_stream_out").select("doc_id").collect()
        .map(_.getLong(0)).sorted.toSeq
      // doc 2 is a cross-file normalize-equal duplicate of doc 1 → dropped
      assert(out == Seq(1L, 3L))
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS src_stream_out")
    }
  }

  test("parsed output feeds the dedup/text operators unchanged") {
    import org.apache.spark.sql.functions.col
    val path = writeLines("feed", Seq(
      """{"doc_id": 1, "text": "one two one", "lang": "en", "source": "w", "n_chars": 11}""",
      """{"doc_id": 2, "text": "one  two ONE", "lang": "en", "source": "w", "n_chars": 12}"""))
    val (clean, _) = DocumentSource.quarantine(DocumentSource.jsonl(spark, path))
    val survivors = graft.llm.Dedup.exactSurvivors(clean, col("doc_id"), col("text"))
    assert(survivors.count() == 1) // normalize-equal texts collapse
  }
}
