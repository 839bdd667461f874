package graft.histo

import graft.model.{Bucket, ExpBucket}

/** Pure histogram math — PromQL-style `histogram_quantile` interpolation over
  * explicit-bound buckets plus exponential-histogram (base-2) percentiles.
  *
  * Semantics follow the reference's percentile library exactly
  * (reference: pkg/histogram/percentile.go:17-67 for explicit buckets,
  * :159-225 for exponential, :83-151 for merge/prefix ops), re-expressed as
  * immutable Scala. Pure functions so they are directly unit-testable and can
  * be bound as Spark UDFs or evaluated inside a Catalyst expression.
  */
object HistogramMath {

  /** Interpolated percentile over explicit-bound buckets with *delta* counts.
    *
    * Rules (reference: pkg/histogram/percentile.go:17-67):
    *   - error when p outside [0,100], no buckets, or total count 0
    *   - buckets sorted ascending by upper bound; target = total * p/100
    *   - first bucket whose cumulative count reaches target:
    *       - empty bucket        → its upper bound
    *       - +Inf bucket         → previous finite bound
    *       - otherwise           → linear interpolation from the previous bound
    *   - target never reached   → last finite bound (or previous if last=+Inf)
    */
  def percentile(buckets: Seq[Bucket], p: Double): Either[String, Double] = {
    if (p < 0 || p > 100) Left(s"percentile must be in [0,100], got $p")
    else if (buckets.isEmpty) Left("no buckets provided")
    else {
      val sorted = buckets.sortBy(_.le)
      val total = sorted.iterator.map(_.count).sum
      if (total <= 0) Left("total count is zero")
      else {
        val target = total.toDouble * (p / 100.0)
        var cum = 0L
        var prevBound = 0.0
        var result = Option.empty[Double]
        val it = sorted.iterator
        while (result.isEmpty && it.hasNext) {
          val b = it.next()
          cum += b.count
          if (cum.toDouble >= target) {
            result = Some(
              if (b.count == 0) b.le
              else if (b.le.isPosInfinity) prevBound
              else {
                val fraction = (target - (cum - b.count).toDouble) / b.count.toDouble
                prevBound + fraction * (b.le - prevBound)
              })
          } else prevBound = b.le
        }
        Right(result.getOrElse {
          val last = sorted.last.le
          if (!last.isPosInfinity) last else prevBound
        })
      }
    }
  }

  /** Multi-percentile helper (reference: pkg/histogram/percentile.go:69-81). */
  def percentiles(buckets: Seq[Bucket], ps: Seq[Double]): Either[String, Seq[Double]] = {
    val results = ps.map(percentile(buckets, _))
    results.collectFirst { case Left(e) => Left(e) }
      .getOrElse(Right(results.collect { case Right(v) => v }))
  }

  /** Merge bucket groups by upper bound, summing counts; result sorted by bound
    * (reference: pkg/histogram/percentile.go:83-105). */
  def mergeBuckets(groups: Seq[Seq[Bucket]]): Seq[Bucket] =
    groups.flatten
      .groupMapReduce(_.le)(_.count)(_ + _)
      .toSeq.map { case (le, c) => Bucket(le, c) }
      .sortBy(_.le)

  /** Delta→cumulative prefix sum over bound-sorted buckets
    * (reference: pkg/histogram/percentile.go:107-128). */
  def deltaToCumulative(delta: Seq[Bucket]): Seq[Bucket] = {
    val sorted = delta.sortBy(_.le)
    var cum = 0L
    sorted.map { b => cum += b.count; Bucket(b.le, cum) }
  }

  /** Cumulative→delta adjacent difference over bound-sorted buckets
    * (reference: pkg/histogram/percentile.go:130-151). */
  def cumulativeToDelta(cumulative: Seq[Bucket]): Seq[Bucket] = {
    val sorted = cumulative.sortBy(_.le)
    var prev = 0L
    sorted.map { b => val d = b.count - prev; prev = b.count; Bucket(b.le, d) }
  }

  /** Midpoint value of exponential-histogram bucket `index` at `scale`:
    * base = 2^(2^-scale); value = (base^i + base^(i+1)) / 2, negated for the
    * negative range (reference: pkg/histogram/percentile.go:212-225). */
  def expBucketValue(index: Int, scale: Int, positive: Boolean): Double = {
    val base = math.pow(2, math.pow(2, -scale.toDouble))
    val v = (math.pow(base, index.toDouble) + math.pow(base, index + 1.0)) / 2
    if (positive) v else -v
  }

  /** Exponential-histogram percentile: walk negative buckets, then the zero
    * bucket, then positive buckets; the bucket reaching the target yields its
    * midpoint value (reference: pkg/histogram/percentile.go:159-210).
    * Bucket lists are assumed index-ascending as stored. */
  def expPercentile(
      scale: Int,
      zeroCount: Long,
      positive: Seq[ExpBucket],
      negative: Seq[ExpBucket],
      p: Double): Either[String, Double] = {
    if (p < 0 || p > 100) Left("percentile must be between 0 and 100")
    else {
      val total = zeroCount + positive.iterator.map(_.count).sum +
        negative.iterator.map(_.count).sum
      if (total <= 0) Left("total count is zero")
      else {
        val target = total.toDouble * (p / 100.0)
        var cum = 0L
        var result = Option.empty[Double]
        val negIt = negative.iterator
        while (result.isEmpty && negIt.hasNext) {
          val b = negIt.next()
          cum += b.count
          if (cum.toDouble >= target)
            result = Some(expBucketValue(b.index, scale, positive = false))
        }
        if (result.isEmpty) {
          cum += zeroCount
          if (cum.toDouble >= target) result = Some(0.0)
        }
        val posIt = positive.iterator
        while (result.isEmpty && posIt.hasNext) {
          val b = posIt.next()
          cum += b.count
          if (cum.toDouble >= target)
            result = Some(expBucketValue(b.index, scale, positive = true))
        }
        Right(result.getOrElse(
          positive.lastOption
            .map(b => expBucketValue(b.index, scale, positive = true))
            .getOrElse(0.0)))
      }
    }
  }

  /** One exponential histogram (for merging). */
  case class ExpHist(
      scale: Int,
      zeroCount: Long,
      zeroThreshold: Double,
      positive: Seq[ExpBucket],
      negative: Seq[ExpBucket])

  /** Merge exponential histograms: rescale every histogram to the minimum
    * scale (index / 2^scaleDiff — integer division toward zero, faithfully
    * reproducing the reference), sum counts per index, sum zero counts, take
    * the max zero threshold (reference: pkg/histogram/percentile.go:227-297). */
  def mergeExpHistograms(hs: Seq[ExpHist]): ExpHist = {
    if (hs.isEmpty) ExpHist(0, 0L, 0.0, Nil, Nil)
    else {
      val minScale = hs.iterator.map(_.scale).min
      def rescaled(select: ExpHist => Seq[ExpBucket]): Seq[ExpBucket] =
        hs.flatMap { h =>
          val shift = 1 << (h.scale - minScale)
          select(h).map(b => ExpBucket(b.index / shift, b.count))
        }.groupMapReduce(_.index)(_.count)(_ + _)
          .toSeq.map { case (i, c) => ExpBucket(i, c) }
          .sortBy(_.index)
      ExpHist(
        minScale,
        hs.iterator.map(_.zeroCount).sum,
        hs.iterator.map(_.zeroThreshold).max,
        rescaled(_.positive),
        rescaled(_.negative))
    }
  }
}
