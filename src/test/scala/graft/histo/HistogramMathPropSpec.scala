package graft.histo

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.{forAll, propBoolean}

import graft.model.{Bucket, ExpBucket}

/** Property pins over the pure histogram math core. Beyond the example-based
  * HistogramSpec cases, these pin the ALGEBRA the engine's execution model
  * leans on:
  *
  *   - merge associativity + commutativity (explicit AND exponential): Spark
  *     applies [[HistogramFunctions.ExpHistMergeAggregator]] and
  *     [[graft.functions.MergeBucketsAgg]] map-side (partial) then
  *     reduce-side in arbitrary grouping order — the result is only
  *     deterministic if the merge is a commutative monoid;
  *   - split-invariance: percentile over a merge of ANY partition of a
  *     bucket multiset equals percentile over the whole — this is the exact
  *     claim behind storing per-sample bucket concats in the rollup tiers
  *     and re-merging at read time ([[graft.plans.RollupRouting]]'s
  *     histogram-dashboard rewrite and the q_read_path_*_hist queries);
  *   - quantile monotonicity in p and range bounds (explicit buckets);
  *   - delta↔cumulative roundtrip identity.
  *
  * Scale caveat pinned deliberately: exp-merge rescaling divides indices by
  * 2^(scale−minScale) with truncation toward zero (reference fidelity,
  * percentile.go:227-297). Truncation-toward-zero composes across steps for
  * every sign (sign × floor-division magnitudes), so associativity still
  * holds at mixed scales — the mixed-scale generator exercises exactly that.
  */
class HistogramMathPropSpec extends Properties("HistogramMath") {

  // ---- generators ------------------------------------------------------

  /** Canonical ascending finite-bound ladder (reference-default-ish). */
  private val Ladder: Vector[Double] =
    Vector(0.005, 0.01, 0.025, 0.05, 0.1, 0.25, 0.5, 1, 2.5, 5, 10)

  /** Delta-count bucket list over distinct ladder bounds, optional +Inf. */
  private val genBuckets: Gen[List[Bucket]] = for {
    n <- Gen.choose(1, Ladder.size)
    bounds <- Gen.pick(n, Ladder.indices)
    counts <- Gen.listOfN(n, Gen.choose(0L, 1000L))
    inf <- Gen.option(Gen.choose(0L, 1000L))
  } yield {
    val finite = bounds.toList.sorted.map(Ladder).zip(counts)
      .map { case (le, c) => Bucket(le, c) }
    finite ++ inf.map(c => Bucket(Double.PositiveInfinity, c)).toList
  }

  private val genNonEmptyBuckets: Gen[List[Bucket]] =
    genBuckets.suchThat(_.map(_.count).sum > 0)

  private val genP: Gen[Double] = Gen.oneOf(
    Gen.choose(0.0, 100.0), Gen.oneOf(0.0, 50.0, 90.0, 95.0, 99.0, 100.0))

  /** Split a list into 1..4 groups preserving multiset membership. */
  private def genSplit[A](xs: List[A]): Gen[List[List[A]]] = for {
    k <- Gen.choose(1, 4)
    tags <- Gen.listOfN(xs.size, Gen.choose(0, k - 1))
  } yield xs.zip(tags).groupBy(_._2).values.map(_.map(_._1)).toList

  private val genExpBuckets: Gen[List[ExpBucket]] = for {
    n <- Gen.choose(0, 6)
    idx <- Gen.pick(n, -8 to 8)
    counts <- Gen.listOfN(n, Gen.choose(1L, 500L))
  } yield idx.toList.sorted.zip(counts).map { case (i, c) => ExpBucket(i, c) }

  private val genExpHist: Gen[HistogramMath.ExpHist] = for {
    scale <- Gen.choose(0, 3)
    zero <- Gen.choose(0L, 100L)
    zt <- Gen.oneOf(0.0, 1e-9, 1e-6)
    pos <- genExpBuckets
    neg <- genExpBuckets
  } yield HistogramMath.ExpHist(scale, zero, zt, pos, neg)

  // canonical form for comparing merged exp histograms
  private def canon(h: HistogramMath.ExpHist): (Int, Long, Double,
      List[(Int, Long)], List[(Int, Long)]) =
    (h.scale, h.zeroCount, h.zeroThreshold,
      h.positive.map(b => (b.index, b.count)).sortBy(_._1).toList,
      h.negative.map(b => (b.index, b.count)).sortBy(_._1).toList)

  // ---- explicit-bucket percentile --------------------------------------

  property("percentile stays within [0, max finite bound]") =
    forAll(genNonEmptyBuckets, genP) { (bs, p) =>
      HistogramMath.percentile(bs, p) match {
        case Right(v) =>
          val maxFinite = bs.map(_.le).filter(!_.isPosInfinity)
            .maxOption.getOrElse(0.0)
          v >= 0.0 && v <= maxFinite
        case Left(_) => false
      }
    }

  property("percentile is monotone in p") =
    forAll(genNonEmptyBuckets, genP, genP) { (bs, p1, p2) =>
      val (lo, hi) = if (p1 <= p2) (p1, p2) else (p2, p1)
      (for {
        a <- HistogramMath.percentile(bs, lo)
        b <- HistogramMath.percentile(bs, hi)
      } yield a <= b).getOrElse(false)
    }

  property("percentile rejects out-of-range p, empty, and zero-total input") =
    forAll(genNonEmptyBuckets) { bs =>
      HistogramMath.percentile(bs, -1).isLeft &&
      HistogramMath.percentile(bs, 101).isLeft &&
      HistogramMath.percentile(Nil, 50).isLeft &&
      HistogramMath.percentile(bs.map(_.copy(count = 0L)), 50).isLeft
    }

  // ---- explicit-bucket merge algebra -----------------------------------

  property("mergeBuckets is order-invariant (commutative)") =
    forAll(genBuckets, genBuckets, genBuckets) { (a, b, c) =>
      HistogramMath.mergeBuckets(Seq(a, b, c)) ==
        HistogramMath.mergeBuckets(Seq(c, a, b))
    }

  property("mergeBuckets is associative (two-step == one-step)") =
    forAll(genBuckets, genBuckets, genBuckets) { (a, b, c) =>
      val twoStep = HistogramMath.mergeBuckets(
        Seq(HistogramMath.mergeBuckets(Seq(a, b)), c))
      twoStep == HistogramMath.mergeBuckets(Seq(a, b, c))
    }

  property("percentile is invariant under any split+merge of the buckets") =
    forAll(genNonEmptyBuckets.flatMap(bs => genSplit(bs).map((bs, _))), genP) {
      case ((bs, groups), p) =>
        val whole = HistogramMath.percentile(
          HistogramMath.mergeBuckets(Seq(bs)), p)
        val split = HistogramMath.percentile(
          HistogramMath.mergeBuckets(groups), p)
        whole == split
    }

  // ---- delta <-> cumulative --------------------------------------------

  property("cumulativeToDelta inverts deltaToCumulative") =
    forAll(genBuckets) { bs =>
      HistogramMath.cumulativeToDelta(HistogramMath.deltaToCumulative(bs)) ==
        bs.sortBy(_.le)
    }

  property("deltaToCumulative is monotone nondecreasing") =
    forAll(genBuckets) { bs =>
      val cum = HistogramMath.deltaToCumulative(bs).map(_.count)
      cum.zip(cum.drop(1)).forall { case (a, b) => a <= b }
    }

  // ---- exponential histograms ------------------------------------------

  property("expBucketValue midpoint lies inside its bucket's bounds") =
    forAll(Gen.choose(-8, 8), Gen.choose(0, 3)) { (i, scale) =>
      val base = math.pow(2, math.pow(2, -scale.toDouble))
      val lo = math.pow(base, i.toDouble)
      val hi = math.pow(base, i + 1.0)
      val v = HistogramMath.expBucketValue(i, scale, positive = true)
      lo <= v && v <= hi &&
        HistogramMath.expBucketValue(i, scale, positive = false) == -v
    }

  property("mergeExpHistograms is commutative at mixed scales") =
    forAll(genExpHist, genExpHist) { (a, b) =>
      canon(HistogramMath.mergeExpHistograms(Seq(a, b))) ==
        canon(HistogramMath.mergeExpHistograms(Seq(b, a)))
    }

  property("mergeExpHistograms is associative at mixed scales") =
    forAll(genExpHist, genExpHist, genExpHist) { (a, b, c) =>
      val left = HistogramMath.mergeExpHistograms(
        Seq(HistogramMath.mergeExpHistograms(Seq(a, b)), c))
      val right = HistogramMath.mergeExpHistograms(
        Seq(a, HistogramMath.mergeExpHistograms(Seq(b, c))))
      val flat = HistogramMath.mergeExpHistograms(Seq(a, b, c))
      canon(left) == canon(flat) && canon(right) == canon(flat)
    }

  property("merging preserves total sample count") =
    forAll(Gen.listOfN(3, genExpHist)) { hs =>
      def total(h: HistogramMath.ExpHist): Long =
        h.zeroCount + h.positive.map(_.count).sum + h.negative.map(_.count).sum
      total(HistogramMath.mergeExpHistograms(hs)) == hs.map(total).sum
    }

  property("expPercentile is monotone in p for positive-only histograms") =
    forAll(genExpHist.map(h => h.copy(negative = Nil)), genP, genP) {
      (h, p1, p2) =>
        val totalN = h.zeroCount + h.positive.map(_.count).sum
        val (lo, hi) = if (p1 <= p2) (p1, p2) else (p2, p1)
        totalN == 0L || (for {
          a <- HistogramMath.expPercentile(h.scale, h.zeroCount,
            h.positive, Nil, lo)
          b <- HistogramMath.expPercentile(h.scale, h.zeroCount,
            h.positive, Nil, hi)
        } yield a <= b).getOrElse(false)
    }

  property("expPercentile over a merge equals expPercentile over the parts' merge order") =
    forAll(Gen.listOfN(3, genExpHist), genP) { (hs, p) =>
      val one = HistogramMath.mergeExpHistograms(hs)
      val two = HistogramMath.mergeExpHistograms(
        Seq(HistogramMath.mergeExpHistograms(hs.take(2)), hs.last))
      HistogramMath.expPercentile(one.scale, one.zeroCount, one.positive,
        one.negative, p) ==
        HistogramMath.expPercentile(two.scale, two.zeroCount, two.positive,
          two.negative, p)
    }
}
