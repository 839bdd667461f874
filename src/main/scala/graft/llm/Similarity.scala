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

  /** Dot product via the codegen'd expression (fp-identical to [[dotHof]],
    * pinned by DotProductExprSpec) — the hot op of the SemDeDup pair stage
    * and every normalize step. */
  def dot(a: Column, b: Column): Column =
    graft.functions.DotProductExpr.dot(a, b)

  /** Readable HOF reference shape of [[dot]] — the sequential left fold
    * from 0.0 in index order, the same associativity the DuckDB oracles
    * restate. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v * v))

  /** Readable HOF reference shape; production paths use [[cosine]] (native,
    * fp-identical — pinned by CosineSimilarityExprSpec). */
  def cosineHof(a: Column, b: Column): Column =
    dotHof(a, b) / (norm(a) * norm(b))

  /** Cosine similarity via the codegen'd expression — the per-candidate hot
    * op of every ANN/near-dup join. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.CosineSimilarityExpr.cosine(a, b)

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

  /** Bucket key = nBits sign bits of random-hyperplane projections —
    * readable reference shape (one interpreted fold per plane). Production
    * paths use [[lshBucket]], the codegen'd one-pass twin; the two are
    * pinned bit-identical by HyperplaneBucketExprSpec. */
  def lshBucketHof(vec: Column, nBits: Int): Column =
    (0 until nBits).map(hyperplaneBit(vec, _)).reduce((a: Column, b: Column) => a.bitwiseOR(b))

  /** Bucket key via the native expression: one generated pass over the
    * vector computes all nBits projections. */
  def lshBucket(vec: Column, nBits: Int): Column =
    graft.functions.HyperplaneBucketExpr.bucket(vec, nBits)

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

  /** Multi-probe LSH ANN — the recall-widening the [[lshTopK]] scaladoc
    * promises, implemented: each probe searches its own bucket PLUS every
    * single-bit flip of it (the nBits hamming-1 neighbors — the buckets a
    * borderline hyperplane projection could have landed in). Candidate
    * recall is a strict superset of single-probe by construction (pinned in
    * LlmSpec), at (nBits+1)× the probe-side bucket keys — and the probe
    * side is the SMALL broadcast side, so the corpus still never
    * self-joins and still carries exactly one bucket per vector; each
    * (probe, neighbor) pair meets at most once because a corpus vector
    * lives in one bucket and the probe's key set is distinct. */
  def lshTopKMultiProbe(corpus: DataFrame, probes: DataFrame, k: Int,
      nBits: Int): DataFrame = {
    val c = corpus.select(col("vec_id").as("nid"),
        col("embedding").cast("array<double>").as("nvec"))
      .withColumn("bucket", lshBucket(col("nvec"), nBits))
    val b0 = lshBucket(col("pvec"), nBits)
    val p = probes.select(col("vec_id").as("pid"),
        col("embedding").cast("array<double>").as("pvec"))
      .withColumn("bucket", explode(array(
        b0 +: (0 until nBits).map(j => b0.bitwiseXOR(lit(1L << j))): _*)))
    val scored = c.join(broadcast(p), Seq("bucket"))
      .filter(col("nid") =!= col("pid"))
      .withColumn("score", cosine(col("pvec"), col("nvec")))
    val w = Window.partitionBy(col("pid")).orderBy(col("score").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("pid"), col("nid"), col("score"), col("rank"))
  }

  /** IVF — inverted-file ANN with a coarse quantizer: every corpus vector is
    * assigned to its nearest centroid's cell (one broadcast pass — the
    * centroid table is tiny by construction); a probe scores only the
    * corpus rows of its `nprobe` nearest cells, then exact re-rank.
    *
    * 100 TB shape: the cell is a partition key. Corpus assignment is a
    * narrow projection + broadcast argmax (no shuffle of the corpus); the
    * candidate join is keyed on `cell`, so each query touches ~nprobe/C of
    * the data. A learned k-means quantizer drops into the same plumbing —
    * `centroids` is just a DataFrame (here: a deterministic corpus stride,
    * so every engine and test can rebuild it). */
  def ivfTopK(corpus: DataFrame, probes: DataFrame, centroids: DataFrame,
      k: Int, nprobe: Int): DataFrame = {
    val cent = centroids.select(col("vec_id").as("cell"),
      col("embedding").cast("array<double>").as("cvec"))
    // explicit cross join: every vector scores every centroid (the centroid
    // side is C rows, broadcast — this is the IVF assignment)
    def scoreCells(df: DataFrame, idOut: String, vecOut: String): DataFrame =
      df.select(col("vec_id").as(idOut),
          col("embedding").cast("array<double>").as(vecOut))
        .crossJoin(broadcast(cent))
        .withColumn("csim", cosine(col(vecOut), col("cvec")))
    // Corpus argmax via hash aggregation, NOT a window: a window would
    // shuffle+sort the full |corpus|×C product; groupBy gets map-side
    // partial combine, so the corpus never moves expanded. Tie-break on the
    // lowest cell id (max of (csim, −cell) lexicographically).
    val c = scoreCells(corpus, "nid", "nvec")
      .groupBy(col("nid"))
      .agg(max_by(col("cell"), struct(col("csim"), -col("cell"))).as("cell"),
        any_value(col("nvec")).as("nvec"))
      .select(col("nid"), col("nvec"), col("cell"))
    // Probe side is the small broadcast set — a window top-nprobe is fine.
    val pw = Window.partitionBy(col("pid")).orderBy(col("csim").desc, col("cell"))
    val p = scoreCells(probes, "pid", "pvec")
      .withColumn("crank", row_number().over(pw))
      .filter(col("crank") <= nprobe)
      .select(col("pid"), col("pvec"), col("cell"))
    val scored = c.join(broadcast(p), Seq("cell"))
      .filter(col("nid") =!= col("pid"))
      .withColumn("score", cosine(col("pvec"), col("nvec")))
    val w = Window.partitionBy(col("pid")).orderBy(col("score").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("pid"), col("nid"), col("score"), col("rank"))
  }

  /** Lloyd refinement of an IVF centroid table — the "learned k-means
    * quantizer" the [[ivfTopK]] scaladoc promises as a drop-in: `iters`
    * rounds of (assign every corpus vector to its max-cosine centroid, the
    * SAME broadcast argmax shape as ivfTopK's assignment) → (new centroid =
    * per-cell mean). Because cosine is scale-invariant, the unnormalized
    * mean assigns identically to the spherical-k-means unit centroid, so
    * each round is a spherical Lloyd step and the mean assigned cosine is
    * monotone non-decreasing (pinned in LlmSpec). Ties break to the lowest
    * cell id; empty cells keep their previous centroid; output keeps the
    * (vec_id, embedding) centroid-table shape so ivfTopK consumes it
    * unchanged.
    *
    * 100 TB shape: assignment never shuffles the corpus (broadcast argmax
    * with map-side combine); the recompute shuffles only (cell, dim)
    * partial averages — k·dim rows. Each round's centroid table is
    * `localCheckpoint`ed: it is k rows, and feeding a lazy plan back into
    * the next round would re-expand the whole history once per reference
    * (the [[Dedup.components]] lesson). */
  def kmeansCentroids(corpus: DataFrame, init: DataFrame, iters: Int): DataFrame = {
    require(iters >= 0, "iters must be non-negative")
    var cent = init.select(col("vec_id").cast("long").as("vec_id"),
      col("embedding").cast("array<double>").as("embedding"))
    for (_ <- 1 to iters) {
      val c = cent.select(col("vec_id").as("cell"), col("embedding").as("cvec"))
      val assigned = corpus
        .select(col("vec_id").as("nid"),
          col("embedding").cast("array<double>").as("nvec"))
        .crossJoin(broadcast(c))
        .withColumn("csim", cosine(col("nvec"), col("cvec")))
        .groupBy(col("nid"))
        .agg(max_by(col("cell"), struct(col("csim"), -col("cell"))).as("cell"),
          any_value(col("nvec")).as("nvec"))
      val means = assigned
        .select(col("cell"), posexplode(col("nvec")).as(Seq("pos", "v")))
        .groupBy(col("cell"), col("pos")).agg(avg(col("v")).as("m"))
        .groupBy(col("cell"))
        .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("m")))),
          e => e.getField("m")).as("emb_new"))
        .select(col("cell").as("vec_id"), col("emb_new"))
      cent = cent.join(means, Seq("vec_id"), "left")
        .select(col("vec_id"),
          coalesce(col("emb_new"), col("embedding")).as("embedding"))
        .localCheckpoint(true)
    }
    cent
  }

  /** Deterministic integer-Lloyd twin of [[kmeansCentroids]] — the full-
    * oracle pin for the learned-quantizer plumbing (the production form is
    * float-argmax-sensitive across engines, so q_ann_ivf_kmeans is
    * rows-only; this closes the last rows-only family without a hash-matched
    * twin, mirroring what q_dedup_minhash_det does for MinHash).
    *
    * Same assignment/recompute shapes as production — broadcast-centroid
    * argmin with map-side combine (corpus never shuffles), per-(cell, dim)
    * partial sums (k·dim rows through the shuffle), localCheckpoint per
    * round — under arithmetic BOTH engines restate bit-identically:
    * vectors quantize to integers via floor(x·scale); assignment is argmin
    * of the INTEGER squared Euclidean distance (ties → lowest cell id);
    * the Lloyd mean floors to an integer centroid, computed as
    * floor(double(s)/m) — exact because |s| < 2⁵³ and a non-integer
    * quotient sits ≥ 1/m from the boundary, far beyond double rounding
    * error (truncating integer division would differ from DuckDB on
    * negative sums; floor division is the shared contract). Empty cells
    * keep their previous centroid, as in production. */
  def kmeansDetCentroids(corpus: DataFrame, init: DataFrame, iters: Int,
      scale: Int = 100): DataFrame = {
    require(iters >= 0, "iters must be non-negative")
    def q(c: Column): Column =
      transform(c.cast("array<double>"),
        x => floor(x * lit(scale.toDouble)).cast("long"))
    val qcorpus = corpus.select(col("vec_id").cast("long").as("nid"),
      q(col("embedding")).as("nvec"))
    var cent = init.select(col("vec_id").cast("long").as("cell"),
      q(col("embedding")).as("cvec")).localCheckpoint(true)
    for (_ <- 1 to iters) {
      val assigned = qcorpus.crossJoin(broadcast(cent))
        .withColumn("d", aggregate(
          zip_with(col("nvec"), col("cvec"), (x, c) => (x - c) * (x - c)),
          lit(0L), (acc, v) => acc + v))
        .groupBy(col("nid"))
        .agg(min_by(col("cell"), struct(col("d"), col("cell"))).as("cell"),
          any_value(col("nvec")).as("nvec"))
      val means = assigned
        .select(col("cell"), posexplode(col("nvec")).as(Seq("pos", "v")))
        .groupBy(col("cell"), col("pos"))
        .agg(sum(col("v")).as("s"), count(lit(1)).as("m"))
        .groupBy(col("cell"))
        .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("s"), col("m")))),
          e => floor(e.getField("s").cast("double") / e.getField("m"))
            .cast("long")).as("newv"))
      cent = cent.join(means, Seq("cell"), "left")
        .select(col("cell"), coalesce(col("newv"), col("cvec")).as("cvec"))
        .localCheckpoint(true)
    }
    cent
  }

  /** Mean assigned cosine — the spherical-k-means objective, exposed so the
    * monotone-improvement property is assertable. */
  def assignmentObjective(corpus: DataFrame, centroids: DataFrame): Double = {
    val c = centroids.select(col("vec_id").as("cell"),
      col("embedding").cast("array<double>").as("cvec"))
    corpus.select(col("vec_id").as("nid"),
        col("embedding").cast("array<double>").as("nvec"))
      .crossJoin(broadcast(c))
      .withColumn("csim", cosine(col("nvec"), col("cvec")))
      .groupBy(col("nid")).agg(max(col("csim")).as("best"))
      .agg(avg(col("best"))).head.getDouble(0)
  }

  /** Product-quantization ANN (Jégou/Douze/Schmid, TPAMI 2011): split each
    * vector into `m` subvectors, quantize every subvector to its nearest
    * codeword (the CODE — one small int per subspace), and answer queries
    * with the asymmetric distance computation (ADC): per probe, precompute
    * the m×|codebook| table of probe-subvector↔codeword distances, then
    * score each corpus vector as the sum of m table lookups over its codes.
    *
    * What PQ buys at 100 TB: MEMORY/IO compression, not candidate pruning —
    * a 64-dim float32 vector (256 B) becomes m small codes (m bytes), a
    * 64× reduction, so the scored representation of a 100 TB embedding
    * corpus fits the page cache that the raw vectors never would. The scan
    * stays linear (compose with [[ivfTopK]]'s cell pruning for sub-linear —
    * classic IVF-PQ; the `codes` relation here is keyed exactly like the
    * corpus, so the cell column drops in unchanged).
    *
    * Plan shape: encode is corpus ⨯ broadcast(m·|codebook| subcodewords)
    * through a map-side-combined per-(vector, subspace) argmin — the
    * corpus never shuffles (the [[ivfTopK]] assignment discipline); the ADC
    * join is keyed on (subspace, code) against the broadcast probe table;
    * scores aggregate with map-side combine on (probe, vector).
    *
    * Arithmetic is INTEGER end-to-end (subvectors quantize via
    * floor(x·scale), distances are integer squared-L2, argmin ties break to
    * the lowest codeword id) — the [[kmeansDetCentroids]] recipe — so the
    * whole query is engine-exact and q_ann_pq needs no rows-only split:
    * PQ codes are lossy by definition, and pinning the quantizer's
    * arithmetic is what makes codes REPRODUCIBLE across engines and runs —
    * a re-encoded 100 TB corpus must yield byte-identical code columns or
    * incremental re-encoding is impossible. Returns (pid, nid, adist,
    * rank): ascending approximate squared distance, top `topK` per probe,
    * self-matches excluded. */
  /** floor(x·scale) integer quantization of an embedding column — the
    * engine-exact arithmetic shared by [[pqTopK]], [[ivfPqTopK]], and
    * [[kmeansDetCentroids]]. */
  private[llm] def quant(c: Column, scale: Int): Column =
    transform(c.cast("array<double>"),
      x => floor(x * lit(scale.toDouble)).cast("long"))

  /** Integer squared-L2 over two array<long> columns — native codegen'd
    * loop ([[graft.functions.L2SqExpr]]; integer arithmetic, so the value
    * is fold-order-exact regardless). The HOF twin below stays as the
    * readable reference shape and the L2SqExprSpec pin. */
  private[llm] def l2sq(a: Column, b: Column): Column =
    graft.functions.L2SqExpr.l2sq(a, b)

  /** Readable HOF reference shape of [[l2sq]] (interpreted — its per-pair
    * lambda dispatch across the N·k assignment crossJoin was the measured
    * superlinear term of q_dedup_semdedup's r18 10× ratio). */
  private[graft] def l2sqHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, v) => acc + v)

  /** Explode a quantized embedding into its m subvectors:
    * (idOut, j ∈ [0, m), sv = qv[j·dsub+1 .. j·dsub+dsub]). */
  private[llm] def subspaces(df: DataFrame, idIn: Column, idOut: String,
      m: Int, dsub: Int, scale: Int): DataFrame =
    df.select(idIn.cast("long").as(idOut),
        quant(col("embedding"), scale).as("qv"))
      .select(col(idOut), explode(sequence(lit(0), lit(m - 1))).as("j"),
        col("qv"))
      .select(col(idOut), col("j"),
        slice(col("qv"), col("j") * dsub + 1, lit(dsub)).as("sv"))

  def pqTopK(corpus: DataFrame, probes: DataFrame, codebook: DataFrame,
      dim: Int, m: Int, topK: Int, scale: Int = 100): DataFrame = {
    require(m > 0 && dim % m == 0, s"dim $dim must split into m=$m subspaces")
    val dsub = dim / m
    val cb = subspaces(codebook, col("vec_id"), "cid", m, dsub, scale)
      .withColumnRenamed("sv", "csv")
    // encode: per-(vector, subspace) argmin over the broadcast codewords —
    // groupBy (map-side combine), never a window over the expanded product
    val codes = subspaces(corpus, col("vec_id"), "nid", m, dsub, scale)
      .join(broadcast(cb), "j")
      .withColumn("qdist", l2sq(col("sv"), col("csv")))
      .groupBy(col("nid"), col("j"))
      .agg(min_by(col("cid"), struct(col("qdist"), col("cid"))).as("code"))
    // ADC table: probe subvector ↔ codeword distances (|probes|·m·|codebook|
    // rows — broadcast by construction)
    val dt = subspaces(probes, col("vec_id"), "pid", m, dsub, scale)
      .join(broadcast(cb), "j")
      .withColumn("pdist", l2sq(col("sv"), col("csv")))
      .select(col("pid"), col("j"), col("cid"), col("pdist"))
    val scored = codes
      .join(broadcast(dt),
        codes("j") === dt("j") && codes("code") === dt("cid"))
      .groupBy(col("pid"), col("nid"))
      .agg(sum(col("pdist")).as("adist"))
      .filter(col("nid") =!= col("pid"))
    val w = Window.partitionBy(col("pid")).orderBy(col("adist"), col("nid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("pid"), col("nid"), col("adist"), col("rank"))
  }

  /** Classic IVF-PQ (Jégou et al., TPAMI 2011 §V): [[ivfTopK]]'s coarse
    * cells prune the candidate set, [[pqTopK]]'s codes compress what gets
    * scored — the composition every billion-vector ANN service runs. A
    * probe visits only its `nprobe` nearest cells (sub-linear candidates)
    * and scores them from m-byte codes (64× less I/O than raw vectors).
    *
    * Plan shape: cell assignment and PQ encode are both broadcast-argmin
    * projections of the corpus (no corpus shuffle, map-side combine); the
    * candidate restriction is an equi-join on `cell` against the broadcast
    * (pid, cell) probe list; ADC lookups join on (subspace, code) against
    * the broadcast distance table; scores aggregate on (pid, nid). Both
    * quantizers here are INTEGER (coarse assignment by integer L2 on the
    * quantized full vector, ties → lowest cell id; codes per [[pqTopK]]) so
    * q_ann_ivfpq is engine-exact and full-oracle like q_ann_pq. */
  def ivfPqTopK(corpus: DataFrame, probes: DataFrame, centroids: DataFrame,
      codebook: DataFrame, dim: Int, m: Int, topK: Int, nprobe: Int,
      scale: Int = 100): DataFrame = {
    require(m > 0 && dim % m == 0, s"dim $dim must split into m=$m subspaces")
    require(nprobe > 0, "nprobe must be positive")
    val dsub = dim / m
    val cent = centroids.select(col("vec_id").as("cell"),
      quant(col("embedding"), scale).as("qcv"))
    // coarse assignment: integer-L2 argmin over the broadcast centroids —
    // the ivfTopK groupBy discipline, never a window over the product
    val cells = corpus
      .select(col("vec_id").cast("long").as("nid"),
        quant(col("embedding"), scale).as("qnv"))
      .crossJoin(broadcast(cent))
      .withColumn("cdist", l2sq(col("qnv"), col("qcv")))
      .groupBy(col("nid"))
      .agg(min_by(col("cell"), struct(col("cdist"), col("cell"))).as("cell"))
    // probe side: top-nprobe cells by ascending integer distance (small,
    // broadcast — a window here is over |probes|·|centroids| rows)
    val pw = Window.partitionBy(col("pid")).orderBy(col("cdist"), col("cell"))
    val probeCells = probes
      .select(col("vec_id").cast("long").as("pid"),
        quant(col("embedding"), scale).as("qpv"))
      .crossJoin(broadcast(cent))
      .withColumn("cdist", l2sq(col("qpv"), col("qcv")))
      .withColumn("crank", row_number().over(pw))
      .filter(col("crank") <= nprobe)
      .select(col("pid"), col("cell"))
    val cb = subspaces(codebook, col("vec_id"), "cid", m, dsub, scale)
      .withColumnRenamed("sv", "csv")
    val codes = subspaces(corpus, col("vec_id"), "nid", m, dsub, scale)
      .join(broadcast(cb), "j")
      .withColumn("qdist", l2sq(col("sv"), col("csv")))
      .groupBy(col("nid"), col("j"))
      .agg(min_by(col("cid"), struct(col("qdist"), col("cid"))).as("code"))
    val dt = subspaces(probes, col("vec_id"), "pid", m, dsub, scale)
      .join(broadcast(cb), "j")
      .withColumn("pdist", l2sq(col("sv"), col("csv")))
      .select(col("pid"), col("j"), col("cid"), col("pdist"))
    // candidate restriction BEFORE any ADC work: only vectors in a probe's
    // visited cells expand into per-subspace lookups
    val cand = cells.join(broadcast(probeCells), Seq("cell"))
      .filter(col("nid") =!= col("pid"))
      .select(col("pid"), col("nid"))
    val dtr = dt.select(col("pid").as("dpid"), col("j").as("dj"),
      col("cid").as("dcid"), col("pdist"))
    val scored = cand
      .join(codes, "nid")
      .join(broadcast(dtr),
        col("pid") === col("dpid") && col("j") === col("dj") &&
          col("code") === col("dcid"))
      .groupBy(col("pid"), col("nid"))
      .agg(sum(col("pdist")).as("adist"))
    val w = Window.partitionBy(col("pid")).orderBy(col("adist"), col("nid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("pid"), col("nid"), col("adist"), col("rank"))
  }

  /** IVF-PQ with exact re-rank (Jégou et al. §V-C — the recipe production
    * ANN services actually run): the ADC shortlist (refine·topK per probe)
    * is re-scored by EXACT integer squared-L2 on the raw quantized vectors
    * and re-cut to topK. ADC ranks are approximate — code compression can
    * swap near-ties; the re-rank restores exact order while touching only
    * |probes|·refine·topK raw vectors instead of the corpus.
    *
    * Plan shape: the shortlist is |probes| × topK × refine rows and the
    * re-rank joins broadcast both it and the raw probe vectors — these
    * scale with the PROBE set (like every broadcast in this ANN family,
    * where probes are the small side by contract), not with the corpus,
    * so the corpus never shuffles for re-ranking. A caller scaling the
    * probe set toward corpus size must drop the hints and let AQE size
    * the joins — the dedup-apply rule. */
  def ivfPqRerankTopK(corpus: DataFrame, probes: DataFrame,
      centroids: DataFrame, codebook: DataFrame, dim: Int, m: Int,
      topK: Int, nprobe: Int, refine: Int, scale: Int = 100): DataFrame = {
    require(refine > 0, "refine must be positive")
    val shortlist = ivfPqTopK(corpus, probes, centroids, codebook, dim, m,
        topK * refine, nprobe, scale)
      .select(col("pid"), col("nid"), col("adist"))
    val qc = corpus.select(col("vec_id").cast("long").as("nid"),
      quant(col("embedding"), scale).as("qnv"))
    val qp = probes.select(col("vec_id").cast("long").as("pid"),
      quant(col("embedding"), scale).as("qpv"))
    val exact = qc.join(broadcast(shortlist), "nid")
      .join(broadcast(qp), "pid")
      .withColumn("dist", l2sq(col("qnv"), col("qpv")))
    val w = Window.partitionBy(col("pid")).orderBy(col("dist"), col("nid"))
    exact.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("pid"), col("nid"), col("dist"), col("adist"), col("rank"))
  }

  /** L2-normalized double view of an embedding table: (vec_id, nv, qv) —
    * nv the unit vector, qv its floor(·100) integer quantization for cell
    * assignment. Normalizing FIRST makes everything downstream
    * scale-invariant: a 2^k-scaled copy normalizes to the IDENTICAL
    * doubles (power-of-two scaling is mantissa-preserving in IEEE-754
    * through square, sum, sqrt, and divide), so a scaled duplicate gets
    * the same cell AND cosine exactly 1 by construction. Zero vectors
    * pass through unnormalized (they cluster together, cosine 0). */
  private[llm] def normalized(emb: DataFrame): DataFrame =
    emb.select(col("vec_id").cast("long").as("vec_id"),
        col("embedding").cast("array<double>").as("v"))
      .select(col("vec_id"), col("v"), dot(col("v"), col("v")).as("n2"))
      .select(col("vec_id"),
        when(col("n2") > 0d,
          transform(col("v"), e => e / sqrt(col("n2")))).otherwise(col("v"))
          .as("nv"))
      .select(col("vec_id"), col("nv"), quant(col("nv"), 100).as("qv"))

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup by
    * embedding clustering — cluster the normalized corpus, compare vectors
    * only WITHIN a cluster, drop every vector whose cluster holds a
    * lower-id vector with cosine ≥ `tau`. Returns the surviving rows of
    * `emb` (all columns).
    *
    * Spark shape, stage by stage:
    *   1. cell assignment — integer-L2 argmin over the broadcast quantized
    *      centroids (ties → lowest cell id): the [[ivfPqTopK]] groupBy
    *      discipline, corpus never shuffles against the product;
    *   2. candidate pairs — equi-join on (cell, bucket) with id_a < id_b,
    *      where bucket is the scale-invariant hyperplane LSH key over the
    *      normalized vector ([[lshBucket]], nBits > 0) that keeps a hot
    *      cell's pair fan-out bounded the same way [[cosineNearDupPairs]]
    *      bounds its buckets; nBits = 0 degenerates to the paper's pure
    *      within-cluster comparison (bucket constant — the restatable form
    *      the oracle checks, pinned a superset of any nBits > 0 pair set);
    *   3. exact cosine = plain dot of unit vectors, threshold at `tau`,
    *      losers = distinct id_b, survivors via un-hinted anti-join (AQE
    *      sizes the loser set — the dedup-apply rule).
    *
    * 100 TB posture: |centroids| is the caller's N/cluster-size knob (the
    * paper runs k ≈ √N to |N|/10k; assignment cost is the linear-scan
    * N·k·dim integer product every IVF variant here pays), per-cell work
    * is (cluster size)² bounded below the nBits sub-bucketing — UNLESS the
    * corpus concentrates a dense near-parallel clump tighter than both the
    * quantization and the hyperplane signs (measured on the 10x replica:
    * ~10% of hashed-bigram vectors in one clump → ~80M within-cell pairs).
    * `anchorCap > 0` arms the production guard against exactly that shape,
    * in two linear stages:
    *   a. exact collapse — identical NORMALIZED vectors (an exact copy, a
    *      positively-scaled re-embed, a token-repeated twin) group on
    *      xxhash64(nv) BEFORE cell assignment; only the lowest-id
    *      representative proceeds, the rest are losers outright (their
    *      mutual cosine is exactly 1 ≥ τ and co-cellmates by construction,
    *      so this is a subset of the paper's own losers — zero-norm
    *      vectors, whose self-dot is 0 < τ, get a per-row key and never
    *      collapse). At crawl scale exact duplicates are the BULK of the
    *      near-dup mass, and they now cost one map-side-combined groupBy
    *      instead of |group|² pairs — and skip the N·k·dim argmin too.
    *   b. anchor cap — within each (cell, bucket), a representative is
    *      compared only against the `anchorCap` lowest-id representatives
    *      (one row_number window on the join key, then the same equi-join
    *      with the a-side capped): per-cell pair work drops from n² to
    *      n·cap, linear. The dfCap=64 winnowing discipline transplanted:
    *      recall against a lower-id partner OUTSIDE the anchor set is
    *      traded away explicitly — but a dense clump is within τ of the
    *      cell's first anchors by definition, so the clump that motivates
    *      the cap is exactly what the cap still catches.
    * Survivors(anchorCap > 0) ⊇ survivors(0) (capped losers need a
    * lower-id witness the uncapped form also sees), with equality whenever
    * every cell fits under the cap — both pinned by EmbedSpec. anchorCap=0
    * keeps the paper's pure all-pairs form (the verify twin the oracles
    * restate without the rank CTE). */
  def semDeDupSurvivors(emb: DataFrame, centroids: DataFrame, tau: Double,
      nBits: Int = 0, anchorCap: Int = 0): DataFrame = {
    val cent = normalized(centroids)
      .select(col("vec_id").as("cell"), col("qv").as("cqv"))
    def assign(n: DataFrame): DataFrame = n.select(col("vec_id"), col("qv"))
      .crossJoin(broadcast(cent))
      .withColumn("il2", l2sq(col("qv"), col("cqv")))
      .groupBy(col("vec_id"))
      .agg(min_by(col("cell"), struct(col("il2"), col("cell"))).as("cell"))
    def keyOf(n: DataFrame): DataFrame = n.join(assign(n), "vec_id")
      .withColumn("bucket",
        if (nBits == 0) lit(0L) else lshBucket(col("nv"), nBits))
      .select(col("vec_id"), col("cell"), col("bucket"), col("nv"))
    def pairs(aSide: DataFrame, bSide: DataFrame): DataFrame =
      aSide.as("a").hint("shuffle_merge")
        .join(bSide.as("b").hint("shuffle_merge"),
          col("a.cell") === col("b.cell") &&
            col("a.bucket") === col("b.bucket") &&
            col("a.vec_id") < col("b.vec_id"))
        .filter(dot(col("a.nv"), col("b.nv")) >= tau)
        .select(col("b.vec_id").as("loser")).distinct()
    val n0 = normalized(emb)
    if (anchorCap <= 0) {
      // the paper's literal form: all-pairs within (cell, bucket).
      // NOT persisted (r21, measured): caching keyed looked attractive
      // (keyOf's branches re-scan the embeddings), but the head-to-head
      // A/B showed the cache fill+scan COSTS more than the saved
      // recompute — the re-evaluated passes are narrow columnar scans +
      // a broadcast-nested-loop over a bounded centroid table.
      val keyed = keyOf(n0)
      val losers = pairs(keyed, keyed)
      emb.join(losers, emb("vec_id") === losers("loser"), "left_anti")
    } else {
      // stage a: exact collapse to one representative per unit vector —
      // ONE map-side-combined groupBy, no join-back (losers fall out as
      // the ids that simply aren't representatives). The group key is the
      // nv ARRAY itself (r19, the r18 advice item): Spark groups array
      // keys natively, the shuffle already carried nv, and the exact list
      // key removes the xxhash64-collision arm where two DISTINCT unit
      // vectors silently merged (expected events near ~2³² rows) — and it
      // now matches the oracle's PARTITION BY nv verbatim. Zero-norm rows
      // take vec_id as a disjoint-by-construction second key column (the
      // oracle's [-(vec_id+1)] arm): cosine can never drop them, so
      // neither may the collapse. qv is a pure function of nv (the
      // floor(·100) quantization), recomputed post-agg so no second
      // dim-long array rides the shuffle.
      val reps = n0
        .select(col("vec_id"), col("nv"))
        .withColumn("zk",
          when(dot(col("nv"), col("nv")) > 0d, lit(0L)).otherwise(col("vec_id")))
        .groupBy(col("nv"), col("zk"))
        .agg(min(col("vec_id")).as("vec_id"))
        .select(col("vec_id"), col("nv"), quant(col("nv"), 100).as("qv"))
      // NOT persisted (r21, measured): keyed feeds the anchor windows and
      // the salted b-side, so caching it looked attractive — but the
      // head-to-head A/B regressed ~0.9 s at sf0.1 (2.4 vs 1.5 s warm):
      // the re-evaluated chain is narrow columnar scans + one map-side
      // aggregate + a broadcast centroid lookup, cheaper than writing and
      // re-reading the vector-carrying cache. Revisit only with a 10x
      // measurement showing recompute dominating.
      val keyed = keyOf(reps)
      // stage b: a-side capped to the per-(cell, bucket) anchor set.
      // Skew posture (r18 advice): the dense hot cell — the exact shape
      // that motivates anchorCap — must not sort or join in one task, so
      // the anchor selection is the two-phase salted top-k
      // ([[graft.llm.Multimodal.dHashDedupApply]]'s discipline): phase 1
      // ranks within (cell, bucket, salt) — a row with global rank r ≤ cap
      // has < r lower ids in its own salt cell, so the global top-cap all
      // survive and phase 2 ranks ≤ nSalts·cap rows per (cell, bucket) —
      // and the pair join salts the b-side with anchors replicated across
      // salts (≤ cap·nSalts rows per cell; pair set unchanged — every
      // (anchor, b) pair meets in exactly the b-row's own salt cell).
      val nSalts = 32
      val salt = pmod(Sampling.scrambleKey(col("vec_id")), lit(nSalts.toLong))
      val anchors = keyed
        .withColumn("rk1", row_number().over(
          Window.partitionBy(col("cell"), col("bucket"), salt)
            .orderBy(col("vec_id"))))
        .filter(col("rk1") <= anchorCap)
        .withColumn("rk2", row_number().over(
          Window.partitionBy(col("cell"), col("bucket")).orderBy(col("vec_id"))))
        .filter(col("rk2") <= anchorCap)
        .select(col("vec_id"), col("cell"), col("bucket"), col("nv"),
          explode(array((0 until nSalts).map(s => lit(s.toLong)): _*)).as("slt"))
      val bSide = keyed.withColumn("slt", salt)
      val nearLosers = anchors.as("a").hint("shuffle_merge")
        .join(bSide.as("b").hint("shuffle_merge"),
          col("a.cell") === col("b.cell") &&
            col("a.bucket") === col("b.bucket") &&
            col("a.slt") === col("b.slt") &&
            col("a.vec_id") < col("b.vec_id"))
        .filter(dot(col("a.nv"), col("b.nv")) >= tau)
        .select(col("b.vec_id").as("loser")).distinct()
      val survivorIds = reps.select(col("vec_id"))
        .join(nearLosers, col("vec_id") === col("loser"), "left_anti")
      emb.join(survivorIds, Seq("vec_id"), "left_semi")
    }
  }

  /** Embedding-cosine near-dup pairs — the embedding-space twin of
    * [[graft.llm.Dedup.minHashCandidates]]: LSH bucket as candidate key,
    * exact cosine inside the bucket, keep pairs ≥ threshold. Positive
    * scaling preserves every hyperplane sign, so a scaled duplicate is
    * GUARANTEED to share its original's bucket — recall 1.0 on true
    * duplicates; near-misses follow the usual LSH recall curve. */
  def cosineNearDupPairs(emb: DataFrame, threshold: Double, nBits: Int): DataFrame = {
    val v = emb.select(col("vec_id"),
        col("embedding").cast("array<double>").as("vec"))
      .withColumn("bucket", lshBucket(col("vec"), nBits))
    v.as("a").hint("shuffle_merge")
      .join(v.as("b").hint("shuffle_merge"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos", cosine(col("a.vec"), col("b.vec")))
      .filter(col("cos") >= threshold)
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"), col("cos"))
  }
}
