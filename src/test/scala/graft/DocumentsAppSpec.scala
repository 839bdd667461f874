package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions.col

/** The config-driven documents pipeline end-to-end: landing files →
  * parse → streaming dedup → corpus + quarantine sinks, with dedup state
  * surviving a checkpointed restart (the same exactly-once bar GraftAppSpec
  * holds the metrics pipeline to).
  */
class DocumentsAppSpec extends SparkSpec {

  private def writeConfig(dir: Path, src: Path, store: Path, ckpt: Path): String = {
    val f = dir.resolve("docs.properties")
    Files.writeString(f,
      s"""source.dir=$src
         |storage.dir=$store
         |checkpoint.dir=$ckpt
         |dedup.horizon=1 hour
         |""".stripMargin)
    f.toString
  }

  private def drop(src: Path, name: String, lines: Seq[String]): Unit = {
    val tmp = Files.createTempFile("graft_docs_drop", ".tmp")
    Files.writeString(tmp, lines.mkString("\n"))
    Files.move(tmp, src.resolve(name))
  }

  test("end-to-end: parse, dedup across batches and restarts, quarantine junk") {
    val root = Files.createTempDirectory("graft_docs_app")
    val src = Files.createDirectory(root.resolve("landing"))
    val store = root.resolve("store")
    val ckpt = root.resolve("ckpt")
    val cfg = DocumentsApp.load(writeConfig(root, src, store, ckpt))
    assert(cfg.horizon == "1 hour")

    drop(src, "b1.jsonl", Seq(
      """{"doc_id": 1, "text": "alpha beta", "lang": "en", "source": "w", "n_chars": 10}""",
      """{"doc_id": 2, "text": "alpha  BETA ", "lang": "en", "source": "w", "n_chars": 12}""",
      """this is junk""",
      """this is junk""")) // identical junk collapses in-horizon
    val q1 = DocumentsApp.start(spark, cfg)
    try q1.processAllAvailable() finally q1.stop()

    val corpus1 = spark.read.parquet(s"$store/corpus")
    assert(corpus1.select("doc_id").collect().map(_.getLong(0)).toSeq == Seq(1L))
    val quarantine1 = spark.read.parquet(s"$store/quarantine")
    assert(quarantine1.select("raw").collect().map(_.getString(0)).toSeq ==
      Seq("this is junk"))

    // RESTART the query from the checkpoint, then land a cross-restart
    // duplicate plus one new doc: state must survive the restart
    drop(src, "b2.jsonl", Seq(
      """{"doc_id": 3, "text": "ALPHA beta", "lang": "en", "source": "w", "n_chars": 10}""",
      """{"doc_id": 4, "text": "gamma", "lang": "de", "source": "b", "n_chars": 5}"""))
    val q2 = DocumentsApp.start(spark, cfg)
    try q2.processAllAvailable() finally q2.stop()

    val corpus2 = spark.read.parquet(s"$store/corpus")
    assert(corpus2.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 4L),
      "doc 3 is a normalize-equal duplicate of doc 1 across the restart")
    // outputs stay partitioned by ingest date
    assert(corpus2.columns.contains("p_date"))
    assert(spark.read.parquet(s"$store/corpus").filter(col("p_date").isNull).isEmpty)
  }

  test("ingest-boundary decontamination routes leaked docs to the audit table") {
    val root = Files.createTempDirectory("graft_docs_app")
    val src = Files.createDirectory(root.resolve("landing"))
    val bench = root.resolve("bench.jsonl")
    Files.writeString(bench,
      """{"doc_id": 900, "text": "the quick brown fox jumps over the lazy dog", "lang": "en", "source": "eval", "n_chars": 43}""")
    val f = root.resolve("docs.properties")
    Files.writeString(f,
      s"""source.dir=$src
         |storage.dir=${root.resolve("store")}
         |checkpoint.dir=${root.resolve("ckpt")}
         |decontam.bench_dir=$bench
         |decontam.ngram=5
         |decontam.min_hits=2
         |""".stripMargin)
    val cfg = DocumentsApp.load(f.toString)
    assert(cfg.decontamN == 5 && cfg.decontamMinHits == 2)

    drop(src, "b1.jsonl", Seq(
      // leaked: wholly contains a benchmark span (>= 2 shared 5-grams)
      """{"doc_id": 1, "text": "intro the quick brown fox jumps over the lazy dog outro", "lang": "en", "source": "w", "n_chars": 56}""",
      // clean: unrelated text
      """{"doc_id": 2, "text": "completely different words entirely unrelated content here now", "lang": "en", "source": "w", "n_chars": 62}"""))
    val q = DocumentsApp.start(spark, cfg)
    try q.processAllAvailable() finally q.stop()
    try {
      val corpus = spark.read.parquet(s"${root.resolve("store")}/corpus")
      assert(corpus.select("doc_id").collect().map(_.getLong(0)).toSeq == Seq(2L))
      val flagged = spark.read.parquet(s"${root.resolve("store")}/contaminated")
      val rows = flagged.select("doc_id", "hits").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(rows.map(_._1) == Seq(1L))
      assert(rows.head._2 >= 2L, s"flagged with ${rows.head._2} hits")
      // audit table keeps the document itself for review
      assert(flagged.columns.contains("text"))
    } finally CacheHygiene.releaseAll(spark)
  }

  test("ingest.stamp_stats stores the quality battery + langid on corpus rows") {
    val root = Files.createTempDirectory("graft_docs_app")
    val src = Files.createDirectory(root.resolve("landing"))
    val f = root.resolve("docs.properties")
    Files.writeString(f,
      s"""source.dir=$src
         |storage.dir=${root.resolve("store")}
         |checkpoint.dir=${root.resolve("ckpt")}
         |ingest.stamp_stats=true
         |""".stripMargin)
    val cfg = DocumentsApp.load(f.toString)
    assert(cfg.stampStats)

    drop(src, "b1.jsonl", Seq(
      """{"doc_id": 1, "text": "the quick brown fox jumps over a lazy dog", "lang": "en", "source": "w", "n_chars": 41}""",
      """{"doc_id": 2, "text": "der schnelle braune Fuchs springt über den faulen Hund hinweg und weiter", "lang": "de", "source": "w", "n_chars": 73}"""))
    val q = DocumentsApp.start(spark, cfg)
    try q.processAllAvailable() finally q.stop()

    val corpus = spark.read.parquet(s"${root.resolve("store")}/corpus")
    for (c <- Seq("n_tokens", "quality", "en_like", "subwords", "lang_pred"))
      assert(corpus.columns.contains(c), s"missing stamped column $c")
    val rows = corpus.select("doc_id", "n_tokens", "lang_pred").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(rows(1L) === ((9L, "en")))
    assert(rows(2L)._2 === "de")
    // the stamped battery equals the batch operator over the same text —
    // ingest stamping is storage of the SAME projection, not a fork
    val expect = DocumentsApp.stampStats(
        corpus.select(col("doc_id"), col("text")))
      .select(col("doc_id"), col("quality"), col("lang_pred"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet
    val got = corpus.select(col("doc_id"), col("quality"), col("lang_pred"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet
    assert(got === expect)

    // toggling the flag against the existing corpus must FAIL FAST — an
    // append would mix schemas in one directory and downstream reads
    // would resolve lang_pred nondeterministically
    val off = root.resolve("docs_off.properties")
    Files.writeString(off,
      s"""source.dir=$src
         |storage.dir=${root.resolve("store")}
         |checkpoint.dir=${root.resolve("ckpt2")}
         |""".stripMargin)
    val e = intercept[IllegalArgumentException] {
      DocumentsApp.start(spark, DocumentsApp.load(off.toString))
    }
    assert(e.getMessage.contains("stamp_stats"))

    // a corpus stamped by an OLDER build (subset of StampedCols — here
    // lang_pred without lang_margin) must fail fast under EITHER flag
    // value: the sentinel-column check would have let stamp_stats=true
    // append a third schema (r13 review finding)
    val store3 = root.resolve("store3")
    spark.range(3).selectExpr("id as doc_id", "'t' as text",
        "cast(id as long) as n_tokens", "'en' as lang_pred")
      .write.parquet(store3.resolve("corpus").toString)
    Seq(true, false).foreach { flag =>
      val p3 = root.resolve(s"docs_partial_$flag.properties")
      Files.writeString(p3,
        s"""source.dir=$src
           |storage.dir=$store3
           |checkpoint.dir=${root.resolve(s"ckpt3_$flag")}
           |ingest.stamp_stats=$flag
           |""".stripMargin)
      val pe = intercept[IllegalArgumentException] {
        DocumentsApp.start(spark, DocumentsApp.load(p3.toString))
      }
      assert(pe.getMessage.contains("PARTIAL"), s"flag=$flag: ${pe.getMessage}")
      assert(pe.getMessage.contains("lang_margin"))
    }
  }

  test("backfillStamps upgrades an unstamped corpus so stamping ingest can resume") {
    val root = Files.createTempDirectory("graft_docs_backfill")
    val src = Files.createDirectory(root.resolve("landing"))
    // phase 2 uses its own landing dir: a fresh checkpoint re-reads
    // everything in source.dir, and re-ingesting b1 is not under test
    val src2 = Files.createDirectory(root.resolve("landing2"))
    val store = root.resolve("store")
    def cfgWith(stamp: Boolean, ckpt: String, source: Path = src): DocumentsConfig =
      DocumentsApp.load {
        val f = root.resolve(s"docs_$stamp$ckpt.properties")
        Files.writeString(f,
          s"""source.dir=$source
             |storage.dir=$store
             |checkpoint.dir=${root.resolve(ckpt)}
             |ingest.stamp_stats=$stamp
             |""".stripMargin)
        f.toString
      }
    // phase 1: an UNSTAMPED corpus lands
    drop(src, "b1.jsonl", Seq(
      """{"doc_id": 1, "text": "the quick brown fox jumps over a lazy dog", "lang": "en", "source": "w", "n_chars": 41}""",
      """{"doc_id": 2, "text": "plain second document with several words", "lang": "en", "source": "w", "n_chars": 40}"""))
    val q1 = DocumentsApp.start(spark, cfgWith(stamp = false, "ckpt1"))
    try q1.processAllAvailable() finally q1.stop()
    // stamping ingest against it fails fast (the guard under test)
    intercept[IllegalArgumentException] {
      DocumentsApp.start(spark, cfgWith(stamp = true, "ckpt2"))
    }
    // backfill, then the SAME config starts and appends stamped rows
    DocumentsApp.backfillStamps(spark, store.toString)
    val corpus1 = spark.read.parquet(s"$store/corpus")
    DocumentsApp.StampedCols.foreach(c =>
      assert(corpus1.columns.contains(c), s"missing backfilled column $c"))
    assert(corpus1.count() === 2)
    // backfilled values equal the batch stamping of the same text
    val expect = DocumentsApp.stampStats(
        corpus1.select(col("doc_id"), col("text")))
      .select(col("doc_id"), col("quality"), col("lang_pred"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet
    val got = corpus1.select(col("doc_id"), col("quality"), col("lang_pred"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet
    assert(got === expect)
    // no leftover swap directories
    assert(!new java.io.File(s"$store/corpus__backfill_tmp").exists())
    assert(!new java.io.File(s"$store/corpus__backfill_old").exists())

    drop(src2, "b2.jsonl", Seq(
      """{"doc_id": 3, "text": "a third document arriving after the backfill", "lang": "en", "source": "w", "n_chars": 45}"""))
    val q2 = DocumentsApp.start(spark, cfgWith(stamp = true, "ckpt3", src2))
    try q2.processAllAvailable() finally q2.stop()
    assert(spark.read.parquet(s"$store/corpus").count() === 3)
  }

  test("backfillStamps heals a PARTIALLY stamped corpus") {
    val root = Files.createTempDirectory("graft_docs_backfill2")
    val store = root.resolve("store")
    // an older build's subset: lang_pred without the rest
    spark.range(3).selectExpr("id as doc_id",
        "concat('doc text number ', cast(id as string)) as text",
        "'en' as lang_pred", "'2024-01-01' as p_date")
      .write.partitionBy("p_date").parquet(store.resolve("corpus").toString)
    DocumentsApp.backfillStamps(spark, store.toString)
    val corpus = spark.read.parquet(s"$store/corpus")
    DocumentsApp.StampedCols.foreach(c =>
      assert(corpus.columns.contains(c), s"missing healed column $c"))
    assert(corpus.count() === 3)
    assert(corpus.columns.count(_ == "lang_pred") === 1, "no duplicate column")
  }

  test("backfillStamps recovers the mid-swap crash state (no corpus, __old present)") {
    val root = Files.createTempDirectory("graft_docs_backfill3")
    val store = root.resolve("store")
    spark.range(3).selectExpr("id as doc_id",
        "concat('some words for doc ', cast(id as string)) as text")
      .write.parquet(store.resolve("corpus").toString)
    // simulate the kill point INSIDE the swap: corpus moved aside, the
    // new directory never landed (a stale tmp may also exist)
    val corpus = store.resolve("corpus").toFile
    val old = store.resolve("corpus__backfill_old").toFile
    assert(corpus.renameTo(old))
    Files.createDirectory(store.resolve("corpus__backfill_tmp"))
    assert(!corpus.exists() && old.exists(), "crash state armed")
    // the next run must self-heal: restore __old, redo the backfill,
    // leave a complete stamped corpus and no swap residue
    DocumentsApp.backfillStamps(spark, store.toString)
    val healed = spark.read.parquet(s"$store/corpus")
    assert(healed.count() === 3)
    DocumentsApp.StampedCols.foreach(c =>
      assert(healed.columns.contains(c), s"missing column $c after recovery"))
    assert(!old.exists(), "swap residue __old must be cleaned")
    assert(!store.resolve("corpus__backfill_tmp").toFile.exists() ||
      spark.read.parquet(s"$store/corpus").count() === 3)
    // ambiguous state (corpus AND __old both present) still fails fast
    spark.range(1).selectExpr("id as doc_id", "'x' as text")
      .write.parquet(store.resolve("corpus__backfill_old").toString)
    intercept[IllegalStateException] {
      DocumentsApp.backfillStamps(spark, store.toString)
    }
  }

  test("landing lifecycle: consumed crawl drops delete (source.clean)") {
    val root = Files.createTempDirectory("graft_docs_app")
    val src = Files.createDirectory(root.resolve("landing"))
    val f = root.resolve("docs.properties")
    Files.writeString(f,
      s"""source.dir=$src
         |storage.dir=${root.resolve("store")}
         |checkpoint.dir=${root.resolve("ckpt")}
         |source.clean=delete
         |""".stripMargin)
    val cfg = DocumentsApp.load(f.toString)
    assert(cfg.sourceClean == "delete")

    drop(src, "b1.jsonl", Seq(
      """{"doc_id": 1, "text": "alpha", "lang": "en", "source": "w", "n_chars": 5}"""))
    val q1 = DocumentsApp.start(spark, cfg)
    try q1.processAllAvailable() finally q1.stop()
    drop(src, "b2.jsonl", Seq(
      """{"doc_id": 2, "text": "beta", "lang": "en", "source": "w", "n_chars": 4}"""))
    val q2 = DocumentsApp.start(spark, cfg)
    try q2.processAllAvailable() finally q2.stop()

    val deadline = System.currentTimeMillis() + 15000
    while (Files.exists(src.resolve("b1.jsonl")) &&
      System.currentTimeMillis() < deadline) Thread.sleep(100)
    assert(!Files.exists(src.resolve("b1.jsonl")),
      "consumed b1.jsonl still in the landing zone")
    assert(spark.read.parquet(s"${root.resolve("store")}/corpus")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
  }
}
