package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023):
  * pick raw-corpus documents whose hashed n-gram feature distribution
  * looks like a TARGET corpus (the "make CommonCrawl look like Wikipedia"
  * curation move). Each document featurizes into hashed-bigram buckets
  * ([[graft.functions.HashedBigramBucketsExpr]]); the target and raw
  * corpora each yield a per-bucket probability estimate; a document's
  * importance weight is Σ_b count_d(b) · log(t̂_b / r̂_b) — the
  * log-likelihood ratio of the doc's features under the two bag-of-bigram
  * models. High weight ⇒ target-like; selection takes the top slice.
  *
  * Integer contract (the LangId/LmScore pattern, but with RUNTIME-derived
  * weights): per-bucket weight W_b = round(Scale·ln((T_b+1)(Rtot+NB) /
  * ((R_b+1)(Ttot+NB))) + 1e-9) — add-one smoothed, milli-nats, the 1e-9
  * boundary shift from [[graft.queries.OracleDefs.stableAvg4]]'s rationale
  * (both engines compute the same double ratio from exact BIGINT counts;
  * the shift keeps round() off any half boundary the ≤ulp ln() disagreement
  * could flip). Document weights are then pure integer sums — hash-stable
  * across engines, so the oracle is FULL (no det twin needed).
  *
  * 100 TB shape: featurization is a scan-speed generated-code pass; each
  * distribution estimate is one explode + map-side-combined groupBy onto
  * NB=64 buckets (shuffle rows ≤ NB × partitions, independent of corpus
  * size); the weight table is NB rows, folded into ONE array in-plan and
  * broadcast via a 1-row cross join; scoring is a per-row HOF sum — zero
  * shuffle. Selection is orderBy+LIMIT (the engine's O2 contract) or a
  * scan-speed threshold filter. Nothing anywhere holds state proportional
  * to the corpus. */
object Dsir {

  /** Feature-space size. The paper uses 10k buckets; 64 keeps the oracle's
    * unrolled restatement readable while exercising the identical shape —
    * a production caller would raise it (the plan does not change). */
  val NBuckets = 64

  /** Milli-nat integer scale, shared with [[LmScore.Scale]]'s rationale. */
  val Scale = 1000

  /** Per-doc hashed-bigram bucket ids over the newline-aware token stream
    * (the Gopher word definition — empty tokens never hash). */
  def bucketIds(text: Column): Column =
    graft.functions.HashedBigramBucketsExpr.buckets(
      TextAnalysis.flatTokens(text), NBuckets)

  /** Per-bucket bigram counts of one corpus: always exactly [[NBuckets]]
    * rows (absent buckets count 0, so the smoothing sees them). */
  private def bucketCounts(docs: DataFrame, text: Column): DataFrame = {
    val spark = docs.sparkSession
    val counts = docs
      .select(explode(bucketIds(text)).as("b"))
      .groupBy(col("b")).agg(count(lit(1)).as("cnt"))
    spark.range(NBuckets).select(col("id").cast("int").as("b"))
      .join(counts, Seq("b"), "left")
      .select(col("b"), coalesce(col("cnt"), lit(0L)).as("cnt"))
  }

  /** The NB-row integer weight table: (b, w) with
    * w = round(Scale·ln( ((t+1)/(Ttot+NB)) / ((r+1)/(Rtot+NB)) ) + 1e-9).
    * Each probability divides FIRST (double) — the cross-multiplied int64
    * form would overflow at 100 TB bigram counts (1e13² ≫ 2⁶³); both
    * engines execute the identical correctly-rounded double ops, so the
    * integer result still hash-matches. */
  def bucketWeights(raw: DataFrame, target: DataFrame, text: Column): DataFrame = {
    val tc = bucketCounts(target, text)
      .select(col("b"), col("cnt").as("tcnt"))
    val rc = bucketCounts(raw, text)
      .select(col("b"), col("cnt").as("rcnt"))
    val joined = tc.join(rc, Seq("b"))
    val tot = joined.agg(sum(col("tcnt")).as("ttot"), sum(col("rcnt")).as("rtot"))
    val tHat = (col("tcnt") + 1).cast("double") / (col("ttot") + NBuckets)
    val rHat = (col("rcnt") + 1).cast("double") / (col("rtot") + NBuckets)
    joined.crossJoin(broadcast(tot))
      .select(col("b"),
        round(lit(Scale) * log(tHat / rHat) + lit(1e-9))
          .cast("long").as("w"))
  }

  /** Append `dsir_w` (integer milli-nat importance weight) to every raw
    * doc: the NB weights fold to ONE broadcast array row; the per-doc sum
    * is a scan-speed HOF over the doc's bucket ids. */
  def withWeights(raw: DataFrame, target: DataFrame, text: Column): DataFrame = {
    val warr = bucketWeights(raw, target, text)
      .agg(array_sort(collect_list(struct(col("b"), col("w")))).as("bw"))
      .select(transform(col("bw"), e => e.getField("w")).as("warr"))
    raw.crossJoin(broadcast(warr))
      .withColumn("dsir_w",
        aggregate(bucketIds(text), lit(0L),
          (acc, b) => acc + element_at(col("warr"), b + 1)))
      .drop("warr")
  }

  /** Top-`k` target-like docs, deterministic tiebreak (w DESC, doc_id). */
  def select(raw: DataFrame, target: DataFrame, text: Column, id: Column,
      k: Int): DataFrame =
    withWeights(raw, target, text)
      .orderBy(col("dsir_w").desc, id)
      .limit(k)
}
