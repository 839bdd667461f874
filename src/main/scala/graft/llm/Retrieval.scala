package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 retrieval scoring (Robertson/Walker, Okapi) — the targeted-mining
  * pass of a curation pipeline: score every corpus document against a
  * small literal query-term set and keep the best matches ("mine more
  * docs that look like my benchmark/domain"). Complements [[Dsir]]: DSIR
  * reweights toward a target CORPUS's distribution; BM25 ranks against an
  * explicit TERM query.
  *
  * Statistics: df_t and the corpus size/average length derive in-plan
  * (one map-side-combined aggregate producing a SINGLE broadcast row —
  * |terms|+2 numbers, no per-term relation); scoring is a scan-speed
  * projection — per-doc tf via one filter-HOF per term over the token
  * array, idf_t = ln(1 + (N − df + 0.5)/(df + 0.5)) (the non-negative
  * BM25+ form), the usual k1/b saturation. No shuffle anywhere but the
  * two tiny aggregates and the final top-k sort.
  *
  * Both engines execute the identical correctly-rounded double ops from
  * exact integer counts, so scores round(·, 6)-match and the query is
  * FULL-oracle (the cosine-score precedent). */
object Retrieval {

  val K1 = 1.2
  val B = 0.75

  /** Append `bm25` for the literal `terms` (exact token match, the
    * whitespace token contract). `id` only names the passthrough. */
  def withBm25(docs: DataFrame, text: Column, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "terms must be non-empty")
    val toks = TextAnalysis.tokens(text)
    val len = size(toks).cast("double")
    // one row: N, avg token length, and every term's document frequency
    val statAggs =
      count(lit(1)).cast("double").as("__n") +:
      avg(size(TextAnalysis.tokens(text))).as("__avg") +:
      terms.zipWithIndex.map { case (t, i) =>
        sum(array_contains(TextAnalysis.tokens(text), t).cast("long"))
          .cast("double").as(s"__df$i")
      }
    val stats = docs.agg(statAggs.head, statAggs.tail: _*)
    val scored = terms.zipWithIndex.map { case (t, i) =>
      val tf = size(filter(toks, x => x === t)).cast("double")
      val idf = log(lit(1.0) +
        (col("__n") - col(s"__df$i") + lit(0.5)) / (col(s"__df$i") + lit(0.5)))
      idf * (tf * lit(K1 + 1.0)) /
        (tf + lit(K1) * (lit(1.0 - B) + lit(B) * len / col("__avg")))
    }.reduce(_ + _)
    docs.crossJoin(broadcast(stats))
      .withColumn("bm25", scored)
      .drop(("__n" +: "__avg" +: terms.indices.map(i => s"__df$i")): _*)
  }

  /** Top-k by (bm25 DESC, id) — deterministic mining cut. */
  def topK(docs: DataFrame, text: Column, id: Column, terms: Seq[String],
      k: Int): DataFrame =
    withBm25(docs, text, terms)
      .orderBy(col("bm25").desc, id)
      .limit(k)
}
