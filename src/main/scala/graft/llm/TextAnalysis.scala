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
  */
object TextAnalysis {

  /** Whitespace tokenization — the split every stat below shares. */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  def distinctTokenCount(text: Column): Column = size(array_distinct(tokens(text)))

  /** Mean token length via pure arithmetic (chars minus the separators,
    * divided by token count) — identical expression on the oracle side. */
  def avgTokenLen(text: Column): Column = {
    val n = tokenCount(text)
    (length(text) - n + lit(1)).cast("double") / n
  }

  def stopwordCount(text: Column, stopwords: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(stopwords.map(_.asInstanceOf[Any]): _*)))

  /** Quality score ∈ [0,1]: blend of length saturation, stopword presence and
    * token diversity — the shape of a Gopher/C4-style quality filter with
    * deterministic, closed-form terms. */
  def qualityScore(text: Column, stopwords: Seq[String]): Column = {
    val n = tokenCount(text).cast("double")
    val lenTerm = least(n / 100.0, lit(1.0))
    val stopTerm = least(stopwordCount(text, stopwords).cast("double") / n * 10.0, lit(1.0))
    val divTerm = distinctTokenCount(text).cast("double") / n
    (lenTerm + stopTerm + divTerm) / 3.0
  }

  /** Language-ID heuristic: stopword-ratio thresholding (the classic n-gram/
    * stopword profile detector collapsed to one profile). Real corpora would
    * carry one stopword set per language; the synthetic corpus shares one
    * vocabulary, so the interesting part — the Spark shape — is a per-row
    * scalar with no shuffle. */
  def langIdScore(text: Column, stopwords: Seq[String]): Column =
    stopwordCount(text, stopwords).cast("double") / tokenCount(text)

  def langIdPredict(text: Column, stopwords: Seq[String], threshold: Double): Column =
    when(langIdScore(text, stopwords) >= threshold, "en-like").otherwise("other")

  /** Document fingerprint: 64-bit hash of the normalized text. Deterministic
    * across runs and partitions (xxhash64 is seed-fixed), so it is a join key
    * for exact dedup at any scale. */
  def fingerprint(text: Column): Column = xxhash64(normalize(text))

  /** Normalization: trim + lowercase + collapse runs of whitespace. */
  def normalize(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** BPE-ish subword count estimate: whitespace tokens plus an extra unit per
    * 4 chars of long tokens — a deterministic stand-in for a real tokenizer's
    * token count (the usual ~4 chars/token heuristic). */
  def subwordCountEstimate(text: Column): Column =
    aggregate(
      tokens(text),
      lit(0L),
      (acc, t) => acc + greatest(lit(1L), ceil(length(t) / 4.0).cast("long")))
}
