package graft

import java.io.FileInputStream
import java.util.Properties

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.llm.TextAnalysis
import graft.sources.DocumentSource

/** Config-driven documents-ingest pipeline — the LLM-corpus twin of
  * [[GraftApp]]'s metrics pipeline. One streaming query: JSONL landing dir →
  * explicit-schema parse → ingest-boundary exact dedup (watermark-bounded
  * state) → optional benchmark decontamination (n-gram overlap against a
  * static eval set, flagged docs to their own audit table) → clean rows
  * appended to the corpus, malformed lines appended to a quarantine table,
  * all from the same micro-batch.
  *
  * Design notes, 100 TB posture:
  *
  *   - Dedup runs in the STREAMING plan (`dropDuplicatesWithinWatermark`),
  *     not inside foreachBatch — cross-micro-batch state lives in the state
  *     store (RocksDB-capable) and survives checkpointed restarts, so a
  *     re-dropped file or a crash never re-admits duplicates inside the
  *     horizon.
  *   - One source read feeds both outputs: the quarantine split happens in
  *     foreachBatch on the deduped frame, not as a second streaming query
  *     that would re-read the landing dir.
  *   - Corrupt rows get a content-keyed fingerprint (xxhash64 of the raw
  *     line) so identical junk within the horizon collapses to one
  *     quarantine record (log-spam suppression) while distinct junk all
  *     lands. Clean rows key on the normalized-text fingerprint as in
  *     [[graft.llm.StreamingDedup]].
  *   - Event time is the ingest micro-batch timestamp: crawl lines carry no
  *     event time of their own in the pinned schema, and an ingest-time
  *     horizon is exactly the "remember recent fingerprints" contract the
  *     prefilter wants. Batch compaction downstream stays the global
  *     guarantee, as documented on StreamingDedup.
  *
  * Config keys (java properties):
  *   source.dir, storage.dir, checkpoint.dir,
  *   dedup.horizon (default "1 hour"), source.max_files_per_trigger,
  *   source.clean (off|delete|archive), source.archive_dir,
  *   decontam.bench_dir (JSONL benchmark set; unset = pass off),
  *   decontam.ngram (default 8), decontam.min_hits (default 2),
  *   ingest.stamp_stats (default false — stamp the text-quality battery
  *   and trigram-NB language prediction onto corpus rows at ingest)
  */
case class DocumentsConfig(
    sourceDir: String,
    storageDir: String,
    checkpointDir: String,
    horizon: String = "1 hour",
    maxFilesPerTrigger: Int = 16,
    sourceClean: String = "off",
    sourceArchiveDir: Option[String] = None,
    decontamBenchDir: Option[String] = None,
    decontamN: Int = 8,
    decontamMinHits: Int = 2,
    stampStats: Boolean = false)

object DocumentsApp {

  def load(path: String): DocumentsConfig = {
    val p = new Properties()
    val in = new FileInputStream(path)
    try p.load(in) finally in.close()
    def get(k: String): Option[String] = Option(p.getProperty(k))
    def req(k: String): String = get(k).getOrElse(
      throw new IllegalArgumentException(s"missing config key: $k"))
    DocumentsConfig(
      sourceDir = req("source.dir"),
      storageDir = req("storage.dir"),
      checkpointDir = req("checkpoint.dir"),
      horizon = get("dedup.horizon").getOrElse("1 hour"),
      maxFilesPerTrigger =
        get("source.max_files_per_trigger").map(_.toInt).getOrElse(16),
      sourceClean = get("source.clean").getOrElse("off"),
      sourceArchiveDir = get("source.archive_dir"),
      decontamBenchDir = get("decontam.bench_dir"),
      decontamN = get("decontam.ngram").map(_.toInt).getOrElse(8),
      decontamMinHits = get("decontam.min_hits").map(_.toInt).getOrElse(2),
      stampStats = get("ingest.stamp_stats").exists(_.toBoolean))
  }

  /** Every column [[stampStats]] adds — the start()-time schema guard
    * checks this exact set so a corpus stamped by an older build (a
    * SUBSET of these) fails fast instead of mixing a third schema. */
  private[graft] val StampedCols: Seq[String] = Seq(
    "n_tokens", "n_distinct", "avg_tok_len", "stop_cnt", "subwords",
    "quality", "en_like", "lang_pred", "lang_margin", "lm_nll_mw",
    "gopher_pass", "rep_ratio")

  /** Ingest-time enrichment (ingest.stamp_stats): the text-quality battery
    * (token counts, quality score, en_like flag) plus the trigram-NB
    * language prediction, stamped as corpus columns. 100 TB point: these
    * are scan-speed per-row projections computed ONCE at ingest and stored
    * — every downstream mixture/filter/decontam pass then reads a column
    * instead of re-running tokenization over the whole corpus. */
  private[graft] def stampStats(df: org.apache.spark.sql.DataFrame):
      org.apache.spark.sql.DataFrame =
    TextAnalysis.withStats(df, col("text"), graft.queries.OracleDefs.Stopwords)
      .withColumn("__pad", graft.llm.LangId.padded(col("text")))
      .withColumn("__sc", graft.llm.LangId.scores(col("__pad")))
      // margin-binned prediction + the margin itself: downstream readers
      // get the 'und' bin AND the raw confidence, both stamped once
      .withColumn("lang_pred",
        graft.llm.LangId.predictWithUnknown(col("__sc"), col("__pad")))
      .withColumn("lang_margin", graft.llm.LangId.margin(col("__sc")))
      // LM perplexity (milli-nats/window): the CCNet curation signal,
      // stamped once like the rest — downstream cuts read a column
      .withColumn("lm_nll_mw",
        graft.llm.LmScore.nllPerWindow(graft.llm.LmScore.nll(col("__pad")),
          graft.llm.LangId.nWindows(col("__pad"))))
      .drop("__pad", "__sc")
      // Gopher composite + repetition ratio: the round-14 rule battery and
      // top-token-multiplicity signals, stamped like everything else so
      // curation cuts read columns. Component signals are dropped —
      // downstream reads the verdicts; re-derive with withGopherSignals
      // when the breakdown is wanted.
      .transform(d => TextAnalysis.withGopherSignals(d, col("text"))
        .drop("n_words", "mean_word_len", "symbol_ratio", "bullet_frac",
          "ellipsis_frac", "alpha_frac", "stop_hits"))
      .withColumn("rep_ratio",
        TextAnalysis.maxTokenFreq(TextAnalysis.tokens(col("text")))
          .cast("double") / col("n_tokens"))

  /** The live "how clean is my corpus" roll-up — per predicted language:
    * docs, token and subword mass, mean quality. The SAME aggregation as
    * the batch q_corpus_stats tail, built over the [[stampStats]] columns,
    * so it runs identically on a batch corpus read or a STREAMING ingest
    * (complete-mode aggregate over the stamped stream: stats computed once
    * at ingest, the dashboard is one stateful agg — no re-tokenization of
    * anything). Streaming ≡ batch pinned by StreamingCorpusStatsSpec. */
  def corpusStats(stamped: org.apache.spark.sql.DataFrame):
      org.apache.spark.sql.DataFrame =
    stamped.groupBy(col("lang_pred"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(col("subwords")).as("total_subwords"),
        graft.queries.OracleDefs.stableAvg4(avg(col("quality")))
          .as("avg_quality"),
        graft.queries.OracleDefs.stableAvg4(avg(col("lm_nll_mw")))
          .as("avg_lm_mw"),
        sum(col("gopher_pass").cast("long")).as("n_gopher_pass"),
        graft.queries.OracleDefs.stableAvg4(avg(col("rep_ratio")))
          .as("avg_rep_ratio"))

  def start(spark: SparkSession, cfg: DocumentsConfig,
      trigger: Trigger = null): StreamingQuery = {
    // fail-fast on a stamp_stats mismatch against an existing corpus: the
    // append sink would otherwise mix schemas in one directory and
    // spark.read.parquet resolves the union nondeterministically (which
    // footer gets sampled decides whether a stamped column exists). The
    // check covers the FULL stamped set, not a sentinel column, so a
    // corpus written by an older stamping build (e.g. lang_pred without
    // lang_margin) also fails fast instead of appending a third schema.
    // The operator must backfill or point at a fresh storage.dir instead.
    val corpusDir = new java.io.File(s"${cfg.storageDir}/corpus")
    if (corpusDir.isDirectory) {
      // Try: an existing-but-empty dir (no parquet yet) has no schema to
      // conflict with — only a readable corpus can disagree with the flag
      scala.util.Try(spark.read.parquet(corpusDir.getPath).schema).foreach { sch =>
        val present = StampedCols.filter(sch.fieldNames.contains)
        val hasAll = present.size == StampedCols.size
        require(!(present.nonEmpty && !hasAll),
          s"existing corpus at ${corpusDir.getPath} carries a PARTIAL stamp " +
            s"schema (has: ${present.mkString(",")}; missing: " +
            s"${StampedCols.diff(present).mkString(",")}) — written by a " +
            "different stamping build; backfill the corpus or use a fresh " +
            "storage.dir")
        require(hasAll == cfg.stampStats,
          s"ingest.stamp_stats=${cfg.stampStats} but the existing corpus at " +
            s"${corpusDir.getPath} ${if (hasAll) "carries" else "lacks"} " +
            "stamped columns — backfill the corpus or use a fresh storage.dir " +
            "before changing the flag")
      }
    }
    // Ingest-boundary decontamination (decontam.bench_dir): the benchmark
    // set is static for the app's lifetime, so its distinct hashed shingle
    // set is derived ONCE here and persisted — each micro-batch pays only
    // the broadcast semi-join, never the benchmark re-derivation. Malformed
    // benchmark lines are ignored (quarantine is an ingest concern; a
    // benchmark file is an operator-provided input).
    val benchShingles = cfg.decontamBenchDir.map { bd =>
      val (benchClean, _) = DocumentSource.quarantine(
        DocumentSource.jsonl(spark, bd))
      graft.llm.Decontamination
        .benchmarkShingles(benchClean, col("text"), cfg.decontamN)
        .persist()
    }
    val parsed = DocumentSource.jsonlStream(spark, cfg.sourceDir,
        cfg.maxFilesPerTrigger, cfg.sourceClean, cfg.sourceArchiveDir)
      .withColumn("ingested_at", current_timestamp())
      // date partition for both outputs (UTC session — same convention as
      // the metrics sink's daily partitions)
      .withColumn("p_date", date_format(col("ingested_at"), "yyyy-MM-dd"))
      // clean rows: normalized-text fingerprint (the dedup key);
      // corrupt rows: content hash of the raw line, so distinct junk never
      // collides with documents and identical junk collapses in-horizon
      .withColumn("fp",
        when(col(DocumentSource.CorruptCol).isNull,
          TextAnalysis.fingerprint(col("text")))
          .otherwise(xxhash64(col(DocumentSource.CorruptCol))))
      .withWatermark("ingested_at", cfg.horizon)
      .dropDuplicatesWithinWatermark("fp")

    val writer = parsed.writeStream
      .option("checkpointLocation", cfg.checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val b = batch.persist()
        try {
          val clean = b.filter(col(DocumentSource.CorruptCol).isNull)
            .drop(DocumentSource.CorruptCol)
          // eval-leakage split: flagged docs land in their own audit table
          // (same per-batch atomicity as quarantine), never in the corpus
          val (kept, contaminated) = benchShingles match {
            case Some(bs) =>
              val hits = graft.llm.Decontamination.hitsAgainst(clean,
                  col("doc_id"), col("text"), bs,
                  cfg.decontamN, cfg.decontamMinHits)
                .select(col("doc_id").as("contaminated_id"), col("hits"))
              (clean.join(broadcast(hits),
                clean("doc_id") === col("contaminated_id"), "left_anti"),
                Some(clean.join(broadcast(hits),
                  clean("doc_id") === col("contaminated_id"))
                  .drop("contaminated_id")))
            case None => (clean, None)
          }
          val enriched = if (cfg.stampStats) stampStats(kept) else kept
          enriched.write.mode("append")
            .partitionBy("p_date")
            .parquet(s"${cfg.storageDir}/corpus")
          contaminated.foreach { c =>
            if (!c.isEmpty)
              c.write.mode("append").partitionBy("p_date")
                .parquet(s"${cfg.storageDir}/contaminated")
          }
          val bad = b.filter(col(DocumentSource.CorruptCol).isNotNull)
            .select(col(DocumentSource.CorruptCol).as("raw"),
              col("ingested_at"), col("p_date"))
          if (!bad.isEmpty)
            bad.write.mode("append").partitionBy("p_date")
              .parquet(s"${cfg.storageDir}/quarantine")
        } finally b.unpersist()
        ()
      }
    Option(trigger).fold(writer)(writer.trigger).start()
  }

  /** Stamp backfill — the tool the [[start]] schema guard's error message
    * directs operators to: bring an existing corpus (unstamped, or
    * partially stamped by an older build) up to the CURRENT
    * [[StampedCols]] schema so `ingest.stamp_stats=true` can resume
    * appending to it. Reads with schema merge (the mixed-schema dir is
    * exactly why the guard fails fast), drops whatever stamp subset is
    * present, re-stamps everything, and swaps directories with a
    * keep-the-old-until-the-new-landed rename so a crash never LOSES
    * data: outside the swap the worst case is corpus + a stale
    * `corpus__backfill_tmp`/`__old` to clean up, and a crash INSIDE the
    * two-rename swap (corpus moved aside, new not yet landed) self-heals
    * at the next run's entry by restoring `__old` and redoing the
    * backfill from it.
    *
    * 100 TB posture: one read → scan-speed stamp projections → one
    * partitioned write; no shuffle beyond the writer's partitioning. A
    * cluster deployment swaps the java.io renames for its object-store
    * committer; the stamping plan is unchanged. */
  def backfillStamps(spark: SparkSession, storageDir: String): Unit = {
    val corpus = new java.io.File(s"$storageDir/corpus")
    val oldDir = new java.io.File(s"$storageDir/corpus__backfill_old")
    // crash recovery (r16 ADVICE): a previous run died INSIDE the swap —
    // after the corpus moved aside but before the new one landed — leaving
    // NO corpus directory. Restore the original and redo the backfill from
    // it (the tmp may be complete but is unverified; the original is the
    // only copy we can trust unconditionally).
    if (!corpus.isDirectory && oldDir.isDirectory)
      require(oldDir.renameTo(corpus),
        s"could not restore ${oldDir.getPath} to ${corpus.getPath} after an " +
          "interrupted swap — resolve manually")
    require(corpus.isDirectory, s"no corpus at ${corpus.getPath}")
    // ambiguous state (corpus AND __old both present) fails fast HERE,
    // before the full re-read/re-stamp/tmp-write is burned (r17 ADVICE:
    // the check used to sit after the expensive work, so every retry paid
    // the whole backfill before aborting)
    if (oldDir.exists())
      throw new IllegalStateException(
        s"stale ${oldDir.getPath} from an interrupted backfill — resolve first")
    val df = spark.read.option("mergeSchema", "true").parquet(corpus.getPath)
    val present = StampedCols.filter(df.schema.fieldNames.contains)
    val stamped = stampStats(df.drop(present: _*))
    val tmp = new java.io.File(s"$storageDir/corpus__backfill_tmp")
    val w = stamped.write.mode("overwrite")
    (if (stamped.columns.contains("p_date")) w.partitionBy("p_date") else w)
      .parquet(tmp.getPath)
    require(corpus.renameTo(oldDir), s"could not move ${corpus.getPath} aside")
    require(tmp.renameTo(corpus),
      s"could not land ${tmp.getPath}; ORIGINAL preserved at ${oldDir.getPath}")
    // the new corpus is in place; the old copy is now disposable
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete(); ()
    }
    rm(oldDir)
  }

  /** Training export — the pipeline's last mile: the curated corpus, split
    * into `nShards` deterministic shards (a power of two), each written as
    * ONE parquet file whose rows sit in their exact global-shuffle order
    * ([[graft.llm.Sampling.shardShuffle]]'s scramble-key permutation with
    * a 1-based `pos`). The same corpus always yields byte-identical shard
    * contents on any cluster size or engine — re-running the export is a
    * no-op diff, and a trainer streaming shard files in `pos` order
    * replays the canonical epoch-0 order.
    *
    * 100 TB shape: shards are contiguous scramble-key ranges, so
    * `repartition(shard)` moves each row exactly once and each task sorts
    * only its own shard's rows (the rank itself came from the bucketed
    * decomposition — no whole-shard window computed it); `partitionBy`
    * yields one `shard=N/` directory per shard with exactly one file
    * (each shard lives wholly inside one task). For shards too large for
    * one task's sort, raise nShards — the knob IS the task size. */
  def exportShards(corpus: org.apache.spark.sql.DataFrame, id:
      org.apache.spark.sql.Column, nShards: Int, outDir: String): Unit =
    graft.llm.Sampling.shardShuffle(corpus, id, nShards)
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("pos"))
      .write.mode("overwrite")
      .partitionBy("shard")
      .parquet(outDir)

  /** [[exportShards]] with the tokenizer applied — every row additionally
    * carries `ids`, the learned-BPE token-id sequence of `text`
    * ([[graft.llm.Bpe.tokenizeIds]]), so the shard files are directly
    * trainer-consumable. Tokenization is a scan-speed generated-code
    * projection riding the same single-move export plan (the merges and
    * vocab are driver-side literals, no extra pass, no extra shuffle);
    * determinism is the text's — same corpus, same merges, same vocab ⇒
    * byte-identical id shards (ExportShardsSpec pins it). */
  def exportTokenShards(corpus: org.apache.spark.sql.DataFrame,
      id: org.apache.spark.sql.Column, text: org.apache.spark.sql.Column,
      nShards: Int, outDir: String,
      merges: Seq[(String, String)], vocab: Seq[String]): Unit =
    graft.llm.Sampling.shardShuffle(corpus, id, nShards)
      .withColumn("ids", graft.llm.Bpe.tokenizeIds(
        graft.llm.TextAnalysis.tokens(text), merges, vocab))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("pos"))
      .write.mode("overwrite")
      .partitionBy("shard")
      .parquet(outDir)

  def main(args: Array[String]): Unit = {
    val cfg = load(args.headOption.getOrElse(
      throw new IllegalArgumentException("usage: DocumentsApp <config.properties>")))
    val spark = Sessions.local()
    val q = start(spark, cfg)
    q.awaitTermination()
  }
}
