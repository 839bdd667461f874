package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Character-trigram language-model quality score — the CCNet/KenLM
  * perplexity filter re-expressed under this repo's integer-weight
  * contract. CCNet's signature curation signal is "perplexity under a LM
  * trained on known-good prose": fluent text re-uses the reference
  * distribution's character transitions and scores low; word salad, boiler
  * junk, and wrong-language text score high.
  *
  * Model: a CONDITIONAL trigram LM over the [[LangId]] en seed (not the NB
  * boost profile — that ranks languages; this estimates fluency):
  * cost(c₁c₂c₃) = −round(Scale·ln((cnt₃+1)/(cnt₂(c₁c₂)+SmoothV))), the
  * add-one-smoothed negative log of P̂(c₃ | c₁c₂), scaled to integers at
  * BUILD time. A document's negative log-likelihood is the sum of window
  * costs over its padded normalized text; unseen trigrams pay the zero-count
  * floor [[UnseenCost]] = −round(Scale·ln(1/SmoothV)). The usable signal is
  * [[UnseenCost]]-bounded milli-nats per window: nll div windows — length-
  * normalized, integer on both engines.
  *
  * 100 TB shape: a per-row projection, one generated-code pass per document
  * ([[graft.functions.LmNllExpr]]) with O(1) probes per trigram — no
  * shuffle, no UDF; composes with the quantile-cut curation the same way
  * the heuristic quality score does. The DuckDB oracle restates the exact
  * sum from the same literals: matched windows join the profile VALUES
  * list, and the (windows − matched) remainder pays UnseenCost — closed
  * arithmetic, no transcendentals at query time on either engine. */
object LmScore {

  val Scale = 1000
  /** Smoothing vocabulary constant, shared with [[LangId.SmoothV]]'s
    * rationale (≈ plausible distinct-trigram count). */
  val SmoothV = 4096

  /** Padded char-bigram counts of the en seed — the conditional's prefix
    * denominators. Built from the SAME normalize + padding the trigram walk
    * uses, so every trigram's prefix bigram has a count here. */
  private lazy val bigramCounts: Map[String, Long] = {
    val p = " " + LangId.normalizeStr(LangId.Seeds("en")) + " "
    (0 to p.length - 2).map(i => p.substring(i, i + 2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
  }

  /** trigram → integer COST (positive; smaller = more English-fluent). */
  lazy val costs: Map[String, Long] = {
    val c3 = LangId.trigramsOf(LangId.Seeds("en"))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    c3.map { case (t, c) =>
      val pre = bigramCounts.getOrElse(t.substring(0, 2), 0L)
      t -> -math.round(Scale * math.log((c + 1.0) / (pre + SmoothV)))
    }.toMap
  }

  /** Unseen-window cost: the zero-count smoothing floor
    * −round(Scale·ln(1/SmoothV)) ≈ 8318 — strictly above every seen cost,
    * so noise text saturates at exactly UnseenCost milli-nats/window. */
  val UnseenCost: Long = math.round(Scale * math.log(SmoothV.toDouble))

  /** Total integer NLL of a PADDED text ([[LangId.padded]]) — native
    * generated-code pass, code-point windows. */
  def nll(paddedText: Column): Column =
    graft.functions.LmNllExpr.nll(paddedText)

  /** Readable HOF twin of [[nll]] — interpreted literal-map fold, pinned
    * bit-identical by LmScoreSpec; production paths use [[nll]]. */
  def nllHof(paddedText: Column): Column = {
    val tris = when(length(paddedText) >= 3,
      transform(sequence(lit(1), length(paddedText) - 2),
        i => paddedText.substr(i, lit(3))))
      .otherwise(array())
    val w = typedLit(costs)
    aggregate(tris, lit(0L),
      (acc, t) => acc + coalesce(element_at(w, t), lit(UnseenCost)))
  }

  /** Length-normalized score: milli-nats per trigram window (integer
    * division — both operands non-negative, so Spark's truncating `div`
    * and DuckDB's flooring `//` agree). 0 for window-less (empty) text. */
  def nllPerWindow(nllCol: Column, nWindows: Column): Column =
    when(nWindows > 0, call_function("div", nllCol, nWindows)).otherwise(lit(0L))

  /** `(tri, w)` VALUES rows for the oracle — generated from the SAME map
    * the expression scores with. */
  lazy val costsSqlValues: String =
    costs.toSeq.sortBy(_._1).map { case (t, w) =>
      s"(${LangId.sqlQuote(t)}, $w)"
    }.mkString(",\n")
}
