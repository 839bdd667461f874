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
  * 100 TB shape: no plan here ever ranks a whole group in one task.
  * [[topKPerGroup]] (k small) salts the group into bounded cells and
  * re-ranks only the ≤ k·nSalts survivors; [[mixture]] (quota proportional
  * to the corpus) decomposes the global rank into contiguous key-range
  * buckets whose offsets come from a tiny count aggregate — per-task work
  * is |group|/nBuckets either way.
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
    * mixture spec.
    *
    * Unlike [[topKPerGroup]] (k small), the quota here is proportional to
    * the corpus, so no plan may ever rank a whole group in one task. The
    * global per-group rank is instead assembled from KEY-RANGE buckets:
    * the scramble key is uniform on [0, 2³²), so its top `log2(nBuckets)`
    * bits split each group into nBuckets contiguous, balanced key ranges.
    * Because buckets are contiguous in the (key, id) total order,
    * global rank = (rows of the group in strictly-lower buckets) +
    * rank-within-bucket — an exact decomposition, no cross-bucket re-rank.
    *
    * Plan shape (pinned by SamplingSpec's whole-group-window audit):
    *   1. per-(group, bucket) counts — one map-side-combined aggregation,
    *      |groups|·nBuckets output rows;
    *   2. cumulative offsets over those COUNTS (a window over the tiny
    *      aggregate, never the corpus) — broadcast back;
    *   3. buckets whose offset already meets the quota are dropped BEFORE
    *      the rank shuffle, so only ~quota + one bucket per group is ever
    *      sorted, in per-bucket tasks of ~|group|/nBuckets rows each.
    * At a 10 B-row group with weight 0.3, the old whole-group window put
    * ~3 B rows through one task; this puts |group|/nBuckets per task and
    * only quota-adjacent buckets through the shuffle at all. */
  def mixture(df: DataFrame, group: Column, id: Column,
      weights: Map[String, Double], total: Long,
      nBuckets: Int = 64): DataFrame = {
    require(total > 0, "total must be positive")
    require(nBuckets > 0 && (nBuckets & (nBuckets - 1)) == 0,
      "nBuckets must be a positive power of two")
    val caps: Map[String, Long] = weights.view
      .mapValues(w => math.floor(w * total).toLong)
      .filter(_._2 > 0).toMap
    require(caps.nonEmpty, "every weight rounded to a zero quota")
    val capCol = coalesce(element_at(typedLit(caps), group), lit(0L))
    val shift = 32 - java.lang.Integer.numberOfTrailingZeros(nBuckets)
    val base = df.filter(capCol > 0)
      .withColumn("__grp", group)
      .withColumn("__key", scrambleKey(id))
      .withColumn("__id", id)
      .withColumn("__bkt", shiftright(col("__key"), shift))
    // rows of the group in strictly-lower key buckets; the window input is
    // the aggregated counts (≤ |groups|·nBuckets rows), not the corpus
    val wOff = Window.partitionBy(col("__grp")).orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base.groupBy(col("__grp"), col("__bkt"))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__off", coalesce(sum(col("__cnt")).over(wOff), lit(0L)))
      .select(col("__grp").as("__ogrp"), col("__bkt").as("__obkt"), col("__off"))
    val grpCap = coalesce(element_at(typedLit(caps), col("__grp")), lit(0L))
    // per-bucket rank: partitions are (group, bucket) cells of
    // ~|group|/nBuckets rows — bounded per-task work, tunable via nBuckets
    val wCell = Window.partitionBy(col("__grp"), col("__bkt"))
      .orderBy(col("__key"), col("__id"))
    base.join(broadcast(offsets), // structurally tiny: |groups|·nBuckets rows
        col("__grp") === col("__ogrp") && col("__bkt") === col("__obkt"))
      .filter(col("__off") < grpCap) // whole bucket past the quota → pruned pre-shuffle
      .withColumn("__rk", col("__off") + row_number().over(wCell))
      .filter(col("__rk") <= grpCap)
      .drop("__grp", "__key", "__id", "__bkt", "__ogrp", "__obkt", "__off", "__rk")
  }

  /** Deterministic Bernoulli subsample: keep a row iff its scramble key
    * falls under fraction·2³² — the cheap "give me ~10% of the corpus"
    * every training pipeline runs before expensive passes. ZERO shuffle
    * (contrast [[mixture]]'s exact quotas, which need the count pass): the
    * filter evaluates at scan speed, composes with pushdown, and is
    * reproducible across runs AND engines (same integer arithmetic as the
    * ranked samples, so the same rows survive wherever it executes). Kept
    * count is binomial around fraction·n, not exact — that is the
    * contract; use [[mixture]]/[[topKPerGroup]] when the count must be
    * exact. */
  def bernoulli(id: Column, fraction: Double): Column = {
    require(fraction >= 0.0 && fraction <= 1.0, "fraction must be in [0,1]")
    scrambleKey(id) < math.floor(fraction * Mod32.toDouble).toLong
  }

  /** Deterministic named split — train/val/test assignment as a pure
    * per-row projection: the scramble key lands in consecutive integer
    * ranges sized by the fractions (same thresholds as [[bernoulli]], so a
    * 0.8/0.1/0.1 split's "train" IS bernoulli(0.8)'s keep set). ZERO
    * shuffle, reproducible across runs/engines, and stable under corpus
    * growth: a document's split never changes when other documents arrive,
    * because assignment depends only on its own id. Fractions must sum to
    * ≤ 1; rows beyond the covered mass get NULL (caller filters or names
    * the remainder explicitly). */
  def splitLabel(id: Column, fractions: Seq[(String, Double)]): Column = {
    require(fractions.nonEmpty, "fractions must be non-empty")
    require(fractions.forall(_._2 >= 0.0), "fractions must be non-negative")
    require(fractions.map(_._2).sum <= 1.0 + 1e-12, "fractions must sum to <= 1")
    val key = scrambleKey(id)
    val bounds = fractions.scanLeft(0.0)(_ + _._2).tail
      .map(c => math.floor(c * Mod32.toDouble).toLong)
    fractions.zip(bounds).foldRight(lit(null).cast("string")) {
      case (((name, _), bound), rest) => when(key < bound, name).otherwise(rest)
    }
  }

  /** Cluster-balanced subsample — the topic-diversity pass (the cluster
    * quota step of SemDeDup-style pruning / DataComp-style balancing): cap
    * every embedding cluster at `k` members so no dominant topic swamps the
    * mix, with members chosen by the same deterministic scrambled-id order
    * every other sampler here uses.
    *
    * Cell assignment is the house integer contract
    * ([[Similarity.kmeansDetCentroids]]'s recipe): vectors quantize via
    * floor(x·scale), assignment is integer-squared-L2 argmin over the
    * BROADCAST centroids (ties → lowest cell id) — the corpus never
    * shuffles for assignment, and both engines restate the arithmetic
    * bit-identically, so the query is FULL-oracle. The quota step is
    * [[topKPerGroup]] (two-phase salted, no whole-cell window).
    *
    * 100 TB shape: one broadcast-argmin scan + the bounded top-k; output
    * ≤ |centroids|·k rows regardless of corpus size. */
  def clusterBalanced(emb: DataFrame, centroids: DataFrame, k: Int,
      scale: Int = 100): DataFrame = {
    def q(c: Column): Column =
      transform(c.cast("array<double>"),
        x => floor(x * lit(scale.toDouble)).cast("long"))
    val corpus = emb.select(col("vec_id"), q(col("embedding")).as("__nv"))
    val cent = centroids.select(col("vec_id").as("cell"),
      q(col("embedding")).as("__cv"))
    val assigned = corpus.crossJoin(broadcast(cent))
      // dimension guard: zip_with null-pads a length mismatch, turning the
      // distance NULL and the argmin silently wrong — fail loudly instead
      .withColumn("__d", when(size(col("__nv")) === size(col("__cv")),
        aggregate(
          zip_with(col("__nv"), col("__cv"), (x, c) => (x - c) * (x - c)),
          lit(0L), (acc, v) => acc + v))
        .otherwise(raise_error(concat(
          lit("clusterBalanced: embedding dim "), size(col("__nv")),
          lit(" != centroid dim "), size(col("__cv"))))))
      .groupBy(col("vec_id"))
      .agg(min_by(col("cell"), struct(col("__d"), col("cell"))).as("cell"))
    topKPerGroup(assigned, col("cell"), col("vec_id"), k)
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

  /** Deterministic global training-order shuffle: every row gets a `shard`
    * (which output file/worker group it belongs to) and a 1-based `pos`
    * (its exact position within the shard), with the order given by the
    * scramble key — the uniform pseudo-random permutation the bernoulli /
    * split / topK samples already share. This is the "shuffle the corpus
    * once, write N shards, stream them in order" pass every epoch-0
    * training pipeline runs; determinism means the same corpus always
    * yields the same byte-identical shards on any engine or cluster size.
    *
    * 100 TB shape: shard = top log2(nShards) bits of the key, so shards
    * are contiguous key ranges and `repartitionByRange`-friendly; `pos` is
    * the [[mixture]] rank decomposition re-used — per-(shard, bucket)
    * counts (one map-side-combined agg), cumulative offsets over that tiny
    * aggregate, then row_number inside (shard, bucket) cells of
    * ~|corpus|/(nShards·nBuckets) rows. No task ever sorts a whole shard:
    * at 100 TB / 1024 shards a whole-shard window would put ~100 GB
    * through single tasks; cells stay ~100 GB/nBuckets and nBuckets is a
    * free knob. Exact decomposition, no cross-cell re-rank, because cells
    * are contiguous in the (key, id) total order. */
  def shardShuffle(df: DataFrame, id: Column, nShards: Int,
      nBuckets: Int = 64): DataFrame = {
    require(nShards > 0 && (nShards & (nShards - 1)) == 0,
      "nShards must be a positive power of two")
    require(nBuckets > 0 && (nBuckets & (nBuckets - 1)) == 0,
      "nBuckets must be a positive power of two")
    val sBits = java.lang.Integer.numberOfTrailingZeros(nShards)
    val bBits = java.lang.Integer.numberOfTrailingZeros(nBuckets)
    require(sBits + bBits <= 31, "nShards·nBuckets must fit the 32-bit key")
    val cols = df.columns.map(col)
    val base = df.withColumn("__key", scrambleKey(id))
      .withColumn("__id", id)
      .withColumn("__shard", shiftright(col("__key"), 32 - sBits))
      .withColumn("__bkt",
        shiftright(col("__key"), 32 - sBits - bBits)
          .bitwiseAND(lit(nBuckets - 1L)))
    // offsets: rows of the shard in strictly-lower buckets — a window over
    // the AGGREGATED counts (≤ nShards·nBuckets rows), never the corpus
    val wOff = Window.partitionBy(col("__shard")).orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base.groupBy(col("__shard"), col("__bkt"))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__off", coalesce(sum(col("__cnt")).over(wOff), lit(0L)))
      .select(col("__shard").as("__oshard"), col("__bkt").as("__obkt"),
        col("__off"))
    val wCell = Window.partitionBy(col("__shard"), col("__bkt"))
      .orderBy(col("__key"), col("__id"))
    base.join(broadcast(offsets), // structurally tiny: nShards·nBuckets rows
        col("__shard") === col("__oshard") && col("__bkt") === col("__obkt"))
      .withColumn("__pos", col("__off") + row_number().over(wCell))
      .select(cols :+ col("__shard").cast("int").as("shard")
        :+ col("__pos").as("pos"): _*)
  }
}
