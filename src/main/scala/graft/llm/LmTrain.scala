package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-TRAINED conditional trigram LM — the learn side of [[LmScore]]
  * (whose model is pinned at build time from the en seed), closing the
  * same loop r14's BPE merge training closed for the pinned subword vocab:
  * estimate the character-trigram model from the corpus itself, then score
  * each document's fluency under it. CCNet trains its KenLM on a clean
  * reference corpus; here the model trains on any docs relation the caller
  * passes (the corpus, or a curated subset), and the cost arithmetic is
  * [[LmScore]]'s: cost(tri) = −round(Scale·ln((c₃+1)/(c₂(prefix)+SmoothV))
  * + 1e-9) milli-nats — integer once rounded, with the 1e-9 boundary shift
  * because BOTH engines now compute the ln at query time (build-time
  * models never needed it).
  *
  * Pruning: the model keeps the top [[TopM]] trigrams by (count desc, tri
  * asc — a total order, so the cut is deterministic); everything else pays
  * the [[LmScore.UnseenCost]] floor. This is the KenLM-pruning analog and
  * the reason the model is driver-broadcastable at ANY corpus size: the
  * trigram space is bounded by the normalized alphabet cubed, and the cap
  * bounds it regardless.
  *
  * 100 TB shape: training is two explode + map-side-combined groupBys onto
  * the bounded trigram/bigram key space (shuffle rows ≤ distinct-window ×
  * partitions, NOT corpus rows) plus a TopM-bounded sort; scoring folds
  * the model into ONE map row, broadcasts it, and sums per-row with a HOF
  * probe — zero shuffle, the same shape as the pinned-model scorer. */
object LmTrain {

  val Scale: Int = LmScore.Scale
  val SmoothV: Int = LmScore.SmoothV
  /** Model-size cap — the pruning bound that keeps the broadcast O(1). */
  val TopM = 4096

  /** Padded char windows of width `w` over a padded normalized text (the
    * [[LmScore.nllHof]] window shape; empty below width) — native
    * one-pass ([[graft.functions.StringWindowsExpr]]); the counting
    * passes explode every window of every document, so the interpreted
    * HOF's per-window lambda+substr constant was the dominant cost. */
  private def windows(p: Column, w: Int): Column =
    graft.functions.StringWindowsExpr.windows(p, w)

  /** The trained model: (tri, cnt, cost), top [[TopM]] trigrams. */
  def trainModel(docs: DataFrame, text: Column): DataFrame = {
    val p = LangId.padded(text)
    val tri = docs.select(explode(windows(p, 3)).as("tri"))
      .groupBy(col("tri")).agg(count(lit(1)).as("cnt"))
    val big = docs.select(explode(windows(p, 2)).as("bg"))
      .groupBy(col("bg")).agg(count(lit(1)).as("c2"))
    tri.join(big, substring(col("tri"), 1, 2) === col("bg"))
      .orderBy(col("cnt").desc, col("tri"))
      .limit(TopM)
      .select(col("tri"), col("cnt"),
        (-round(lit(Scale) *
          log((col("cnt") + 1).cast("double") / (col("c2") + SmoothV)) +
          lit(1e-9))).cast("long").as("cost"))
  }

  /** Collect a [[trainModel]] result into the driver-side literal form the
    * scorer embeds — bounded by [[TopM]] (the k-means-centroid class of
    * driver model state, not a data collect; the learnedSubwordCount
    * merges-Seq precedent). */
  def collectModel(model: DataFrame): Map[String, Long] =
    model.select(col("tri"), col("cost")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  /** Append `n_win`, `nll_t` (total trained-model NLL, milli-nats) and
    * `lm_t_mw` (per-window) to `docs`: one generated-code pass per row
    * with O(1) model probes ([[graft.functions.LmModelNllExpr]] — the
    * map-COLUMN alternative probes element_at's linear scan over all TopM
    * entries per window and benched 22.6 s at sf0.1 where this runs at
    * scan speed). Zero shuffle; the unseen floor pays for pruned/unseen
    * windows. */
  def withTrainedNll(docs: DataFrame, text: Column,
      model: Map[String, Long]): DataFrame =
    docs.withColumn("__p", LangId.padded(text))
      .withColumn("n_win", greatest(length(col("__p")) - 2, lit(0)).cast("long"))
      .withColumn("nll_t",
        graft.functions.LmModelNllExpr.nll(col("__p"), model, LmScore.UnseenCost))
      .withColumn("lm_t_mw", LmScore.nllPerWindow(col("nll_t"), col("n_win")))
      .drop("__p")
}
