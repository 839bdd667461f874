package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline over the `documents`
  * table: tokenization, quality stats, language-ID heuristic, fingerprinting.
  *
  * Everything here is a narrow per-row projection of built-in (codegen'd)
  * functions — no UDFs, no shuffles — so at 100 TB it runs at scan speed and
  * composes with any downstream filter/groupBy. Formulas are engine-portable
  * arithmetic so the DuckDB oracle can state the identical expression.
  *
  * Tokenize ONCE: every stat takes the materialized token array (project
  * `tokens(text).as("toks")` in one stage, then reference the attribute),
  * not the raw text. `split` is non-cheap, so CollapseProject keeps the
  * two-stage projection and the split runs once per row instead of once per
  * stat; likewise the derived counters (n_tokens/n_distinct/stop_cnt) should
  * be projected once and fed to [[qualityScore]]/[[stopwordRatio]] as columns.
  */
object TextAnalysis {

  /** Whitespace tokenization — the split every stat below shares. */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(toks: Column): Column = size(toks)

  def distinctTokenCount(toks: Column): Column = size(array_distinct(toks))

  /** Mean token length via pure arithmetic (chars minus the separators,
    * divided by token count) — identical expression on the oracle side. */
  def avgTokenLen(text: Column, toks: Column): Column = {
    val n = size(toks)
    (length(text) - n + lit(1)).cast("double") / n
  }

  def stopwordCount(toks: Column, stopwords: Seq[String]): Column =
    size(filter(toks, t => t.isin(stopwords.map(_.asInstanceOf[Any]): _*)))

  /** Quality score ∈ [0,1]: blend of length saturation, stopword presence and
    * token diversity — the shape of a Gopher/C4-style quality filter with
    * deterministic, closed-form terms. Takes the three PRE-PROJECTED counters
    * so each is computed once per row however many scores consume them. */
  def qualityScore(nTokens: Column, nDistinct: Column, stopCnt: Column): Column = {
    val n = nTokens.cast("double")
    val lenTerm = least(n / 100.0, lit(1.0))
    val stopTerm = least(stopCnt.cast("double") / n * 10.0, lit(1.0))
    val divTerm = nDistinct.cast("double") / n
    (lenTerm + stopTerm + divTerm) / 3.0
  }

  /** Stopword ratio — a QUALITY feature (functional-word density), not a
    * language claim: the r11 verdict's point was that thresholding this is
    * not language identification (it calls all non-English text
    * "non-language"). Real langid is [[LangId]] (char-trigram Naive Bayes);
    * this survives as the cheap English-likeness gate the C4-style cleaning
    * composites use. */
  def stopwordRatio(nTokens: Column, stopCnt: Column): Column =
    stopCnt.cast("double") / nTokens

  /** English-likeness flag from [[stopwordRatio]] thresholding — honest
    * name for what the old `langIdPredict` computed. */
  def enLikePredict(nTokens: Column, stopCnt: Column, threshold: Double): Column =
    when(stopwordRatio(nTokens, stopCnt) >= threshold, "en-like").otherwise("other")

  /** Max token multiplicity — the repetition signal of a Gopher-style
    * filter (native one-pass count; see
    * [[graft.functions.MaxTokenFreqExpr]]). `maxTokenFreq / n_tokens` near
    * 1 means the document is one token repeated: boilerplate/spam. */
  def maxTokenFreq(toks: Column): Column =
    graft.functions.MaxTokenFreqExpr.maxFreq(toks)

  /** Readable HOF twin of [[maxTokenFreq]] (O(distinct·n) interpreted —
    * reference shape only; empty arrays coalesce to 0 like the native). */
  def maxTokenFreqHof(toks: Column): Column =
    coalesce(
      array_max(transform(array_distinct(toks),
        x => size(filter(toks, y => y === x)))),
      lit(0))

  /** Document fingerprint: 64-bit hash of the normalized text. Deterministic
    * across runs and partitions (xxhash64 is seed-fixed), so it is a join key
    * for exact dedup at any scale. */
  def fingerprint(text: Column): Column = xxhash64(normalize(text))

  /** Normalization: trim + lowercase + collapse runs of whitespace. Native
    * expression (per-document fingerprint path — regexp_replace pays a regex
    * walk per row); pinned bit-identical by NormalizeTextExprSpec. */
  def normalize(text: Column): Column =
    graft.functions.NormalizeTextExpr.normalize(text)

  /** Readable HOF/regex reference shape of [[normalize]]. */
  def normalizeHof(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** PII redaction patterns — the RE2-compatible subset (no lookaround, no
    * backreferences) so the exact same pattern strings run under Spark's
    * Java regex AND the DuckDB/RE2 oracle. Order of application matters:
    * emails first (their local parts contain digits a phone pattern would
    * eat), then IPv4 (dotted digits), then phones (digit runs with
    * separators). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\+?\\d[\\d -]{7,}\\d"

  /** PII scrub — the training-data pipeline's redaction pass: emails, IPv4
    * addresses, and phone-like digit runs each collapse to a typed
    * placeholder. Pure codegen'd `regexp_replace` chain: scan-speed, no
    * shuffle, no UDF; a swap to native-library NER is a drop-in replacement
    * of this Column. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** BPE-ish subword count estimate: whitespace tokens plus an extra unit per
    * 4 chars of long tokens — a deterministic stand-in for a real tokenizer's
    * token count (the usual ~4 chars/token heuristic). */
  def subwordCountEstimate(toks: Column): Column =
    aggregate(
      toks,
      lit(0L),
      (acc, t) => acc + greatest(lit(1L), ceil(length(t) / 4.0).cast("long")))

  /** The full stat battery as a staged projection: tokenize once, derive all
    * counters in ONE native pass ([[graft.functions.TokenStatsExpr]] — pinned
    * bit-identical to the per-stat HOF shapes above by TokenStatsExprSpec),
    * then compose scores from the counters.
    * Output columns: n_tokens, n_distinct, avg_tok_len, stop_cnt, quality,
    * en_like, subwords — appended to `df`'s columns (minus the internal
    * token array and stats struct). */
  def withStats(df: DataFrame, text: Column, stopwords: Seq[String],
      langThreshold: Double = 0.06): DataFrame = {
    val st = col("__tstats")
    df.withColumn("__tstats",
        graft.functions.TokenStatsExpr.stats(tokens(text), stopwords))
      .withColumns(Map(
        "n_tokens" -> st.getField("n_tokens").cast("long"),
        "n_distinct" -> st.getField("n_distinct").cast("long"),
        "avg_tok_len" ->
          ((length(text) - st.getField("n_tokens") + lit(1)).cast("double") /
            st.getField("n_tokens")),
        "stop_cnt" -> st.getField("stop_cnt").cast("long"),
        "subwords" -> st.getField("subwords")))
      .withColumns(Map(
        "quality" -> qualityScore(col("n_tokens"), col("n_distinct"), col("stop_cnt")),
        "en_like" -> enLikePredict(col("n_tokens"), col("stop_cnt"), langThreshold)))
      .drop("__tstats")
  }
}
