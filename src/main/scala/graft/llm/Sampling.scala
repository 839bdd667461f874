package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data mixtures.
  *
  * Capping a domain/source at k documents ("mixture weights") needs a sample
  * that is (a) uniform-ish, (b) reproducible across runs AND engines, and
  * (c) expressible as one window — no RNG state, no driver loop. The order
  * key is a Knuth multiplicative hash (id × 2654435761 mod 2³²): pure integer
  * arithmetic, so the oracle restates it verbatim, unlike `rand(seed)` (Spark
  * RNG stream) or xxhash64 (not available in other engines). It scrambles
  * sequential ids thoroughly enough for mixture capping; it is NOT a
  * cryptographic or adversarial-proof permutation.
  *
  * 100 TB shape: one shuffle on the group key, per-group top-k via
  * row_number — the same pattern as the ANN re-rank. Groups are domains
  * (thousands), not documents, so the window partitions are coarse and the
  * cap keeps each one's output bounded.
  */
object Sampling {

  private val Knuth = 2654435761L
  private val Mod31 = 2147483648L // 2^31
  private val Mod32 = 4294967296L // 2^32

  /** The engine-portable scramble key. The id is folded to 31 bits BEFORE
    * the multiply so the product maxes at (2^31−1)·2654435761 ≈ 5.7e18,
    * under 2^63−1 ≈ 9.2e18 — int64 arithmetic then never overflows on
    * EITHER engine (Spark would wrap silently, DuckDB would raise; both
    * would break the cross-engine contract). Ids that collide mod 2^31 are
    * separated by the caller's id tiebreak. */
  def scrambleKey(id: Column): Column =
    pmod(pmod(id.cast("long"), lit(Mod31)) * Knuth, lit(Mod32))

  /** Weighted mixture resample — the domain-reweighting pass of a training
    * mix: group g keeps floor(weights(g) × total) rows, chosen by the same
    * scrambled-id order as [[topKPerGroup]]; groups absent from `weights`
    * (or rounding to a zero quota) are dropped — the weights map IS the
    * mixture spec. Single pass: the quota table rides along as a literal
    * map column, so there is one scan and one group-keyed shuffle no matter
    * how many distinct quotas the mix has. The phase-1 salt-cell bound uses
    * the LARGEST quota (a superset for smaller-quota groups — correct, just
    * looser); phase 2 applies each group's own cap. */
  def mixture(df: DataFrame, group: Column, id: Column,
      weights: Map[String, Double], total: Long,
      nSalts: Int = 32): DataFrame = {
    require(total > 0, "total must be positive")
    val caps: Map[String, Long] = weights.view
      .mapValues(w => math.floor(w * total).toLong)
      .filter(_._2 > 0).toMap
    require(caps.nonEmpty, "every weight rounded to a zero quota")
    val maxCap = caps.values.max
    val capCol = coalesce(element_at(typedLit(caps), group), lit(0L))
    val salt = pmod(scrambleKey(id), lit(nSalts.toLong))
    val w1 = Window.partitionBy(group, salt).orderBy(scrambleKey(id), id)
    val w2 = Window.partitionBy(group).orderBy(scrambleKey(id), id)
    df.filter(capCol > 0)
      .withColumn("__rk1", row_number().over(w1))
      .filter(col("__rk1") <= maxCap)
      .withColumn("__rk", row_number().over(w2))
      .filter(col("__rk") <= capCol)
      .drop("__rk1", "__rk")
  }

  /** Keep at most k rows per group, chosen by scrambled-id order
    * (deterministic; ties impossible while `id` is unique mod the fold,
    * which the id tiebreak below absorbs).
    *
    * Two-phase so no task ever sorts a whole group: phase 1 takes the top-k
    * of every (group, salt) cell — window partitions bounded at
    * |group|/nSalts — phase 2 re-ranks the ≤ k·nSalts survivors per group.
    * The global top-k is a subset of the per-salt top-ks (the order is a
    * total order), so the result is IDENTICAL to a single whole-group
    * window; only the plan changes. */
  def topKPerGroup(df: DataFrame, group: Column, id: Column, k: Int,
      nSalts: Int = 32): DataFrame = {
    require(k > 0, "k must be positive")
    require(nSalts > 0, "nSalts must be positive")
    // salt on the SCRAMBLED key, not the raw id: block- or stride-allocated
    // ids can be wildly non-uniform mod nSalts, which would collapse a
    // group back into one cell — the exact pathology the two phases remove
    val salt = pmod(scrambleKey(id), lit(nSalts.toLong))
    val w1 = Window.partitionBy(group, salt).orderBy(scrambleKey(id), id)
    val w2 = Window.partitionBy(group).orderBy(scrambleKey(id), id)
    df.withColumn("__rk1", row_number().over(w1))
      .filter(col("__rk1") <= k)
      .withColumn("__rk", row_number().over(w2))
      .filter(col("__rk") <= k)
      .drop("__rk1", "__rk")
  }
}
