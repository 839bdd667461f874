package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * Two tiers, as a 100 TB pipeline needs:
  *   - [[bruteForceTopK]]: exact cosine top-k of a SMALL probe set against the
  *     corpus. The probe side is broadcast (no corpus shuffle at all); the
  *     corpus is scanned once, scored per partition, and only per-probe top-k
  *     rows survive the window. Correct baseline + the oracle-checkable path.
  *   - [[lshTopK]]: random-hyperplane LSH — deterministic hyperplanes, sign
  *     bits → bucket key, candidates = bucket collision, exact re-rank inside
  *     the bucket. The corpus never self-joins; the only shuffle is the
  *     bucket-keyed candidate join. Multi-probe (flip one bit) widens recall.
  *     An IVF variant would swap the hash for learned centroids; the Spark
  *     plumbing (bucket column + equi-join + re-rank) is identical.
  *
  * All math in double: embeddings are float32 at rest, but accumulating dot
  * products in float drifts across engines; cast once at entry.
  */
object Similarity {

  /** Dot product of two array<double> columns (sequential left fold —
    * the same associativity the oracle's list_dot_product uses). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v * v))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact cosine top-k: probes (small, broadcast) × corpus, ranked per probe.
    * Self-matches excluded. Tie-break on neighbor id keeps output
    * deterministic. */
  def bruteForceTopK(corpus: DataFrame, probes: DataFrame, k: Int): DataFrame = {
    val c = corpus.select(col("vec_id").as("nid"),
      col("embedding").cast("array<double>").as("nvec"))
    val p = probes.select(col("vec_id").as("pid"),
      col("embedding").cast("array<double>").as("pvec"))
    val scored = c.join(broadcast(p), col("nid") =!= col("pid"))
      .withColumn("score", cosine(col("pvec"), col("nvec")))
    val w = Window.partitionBy(col("pid")).orderBy(col("score").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("pid"), col("nid"), col("score"), col("rank"))
  }

  /** Deterministic pseudo-random hyperplane weight: h[j][d] = sin(j*997 + d).
    * Closed-form (no RNG state) so every engine — and the oracle — can restate
    * it bit-for-bit. */
  def hyperplaneBit(vec: Column, j: Int): Column = {
    val proj = aggregate(
      zip_with(vec, sequence(lit(0), size(vec) - 1),
        (x, d) => x * sin(lit(j * 997).cast("double") + d)),
      lit(0.0), (acc, v) => acc + v)
    when(proj >= 0, lit(1L << j)).otherwise(0L)
  }

  /** Bucket key = nBits sign bits of random-hyperplane projections. */
  def lshBucket(vec: Column, nBits: Int): Column =
    (0 until nBits).map(hyperplaneBit(vec, _)).reduce((a: Column, b: Column) => a.bitwiseOR(b))

  /** LSH-bucketed ANN: score only within the probe's bucket, exact re-rank.
    * Recall < 1 by construction; `nBits` trades bucket size vs recall
    * (65k buckets at 16 bits ⇒ ~corpus/65k candidates per probe). */
  def lshTopK(corpus: DataFrame, probes: DataFrame, k: Int, nBits: Int): DataFrame = {
    val c = corpus.select(col("vec_id").as("nid"),
        col("embedding").cast("array<double>").as("nvec"))
      .withColumn("bucket", lshBucket(col("nvec"), nBits))
    val p = probes.select(col("vec_id").as("pid"),
        col("embedding").cast("array<double>").as("pvec"))
      .withColumn("bucket", lshBucket(col("pvec"), nBits))
    val scored = c.join(broadcast(p), Seq("bucket"))
      .filter(col("nid") =!= col("pid"))
      .withColumn("score", cosine(col("pvec"), col("nvec")))
    val w = Window.partitionBy(col("pid")).orderBy(col("score").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("pid"), col("nid"), col("score"), col("rank"))
  }
}
