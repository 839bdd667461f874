package graft.histo

import graft.model.{Bucket, ExpBucket}
import org.scalatest.funsuite.AnyFunSuite

/** Golden expectations ported from the reference's own unit tests
  * (reference: test/histogram_test.go) plus seeded-random property checks.
  */
class HistogramMathSpec extends AnyFunSuite {

  private val golden = Seq(
    Bucket(0.005, 100), Bucket(0.01, 200), Bucket(0.025, 300),
    Bucket(0.05, 200), Bucket(0.1, 150), Bucket(0.25, 30),
    Bucket(0.5, 15), Bucket(1.0, 5), Bucket(Double.PositiveInfinity, 0))

  // NOTE: the reference's unit test expects P50=0.0167+-0.001
  // (histogram_test.go:21-37), but its own implementation
  // (pkg/histogram/percentile.go:17-67) computes 0.02 for these buckets:
  // target=500, cum(0.01)=300, fraction=(500-300)/300=2/3,
  // 0.01 + 2/3*(0.025-0.01) = 0.02. The test constant is stale; we pin the
  // implementation semantics, which our port reproduces exactly.
  test("P50 = 0.02 exact (implementation-derived; histogram_test.go:21-37 constant is stale)") {
    val Right(v) = HistogramMath.percentile(golden, 50)
    assert(math.abs(v - 0.02) <= 1e-12, s"got $v")
  }

  test("P95 = 0.1 exact, within reference tolerance of 0.0933 +- 0.01 (histogram_test.go:39-55)") {
    val Right(v) = HistogramMath.percentile(golden, 95)
    assert(math.abs(v - 0.1) <= 1e-12, s"got $v")
    assert(math.abs(v - 0.0933) <= 0.01)
  }

  test("P99 = 0.4 +- 0.1 (histogram_test.go:57-73)") {
    val Right(v) = HistogramMath.percentile(golden, 99)
    assert(math.abs(v - 0.4) <= 0.1, s"got $v")
  }

  test("errors: p out of range, empty buckets, zero total") {
    assert(HistogramMath.percentile(golden, -1).isLeft)
    assert(HistogramMath.percentile(golden, 101).isLeft)
    assert(HistogramMath.percentile(Nil, 50).isLeft)
    assert(HistogramMath.percentile(Seq(Bucket(1.0, 0)), 50).isLeft)
  }

  test("delta->cumulative (histogram_test.go:89-124)") {
    val delta = Seq(Bucket(0.005, 10), Bucket(0.01, 20), Bucket(0.025, 30),
      Bucket(0.05, 15), Bucket(0.1, 5))
    val expected = Seq(Bucket(0.005, 10), Bucket(0.01, 30), Bucket(0.025, 60),
      Bucket(0.05, 75), Bucket(0.1, 80))
    assert(HistogramMath.deltaToCumulative(delta) == expected)
  }

  test("cumulative->delta (histogram_test.go:126-161)") {
    val cum = Seq(Bucket(0.005, 10), Bucket(0.01, 30), Bucket(0.025, 60),
      Bucket(0.05, 75), Bucket(0.1, 80))
    val expected = Seq(Bucket(0.005, 10), Bucket(0.01, 20), Bucket(0.025, 30),
      Bucket(0.05, 15), Bucket(0.1, 5))
    assert(HistogramMath.cumulativeToDelta(cum) == expected)
  }

  test("merge buckets (histogram_test.go:163-211)") {
    val groups = Seq(
      Seq(Bucket(0.005, 10), Bucket(0.01, 20), Bucket(0.025, 30)),
      Seq(Bucket(0.005, 5), Bucket(0.01, 10), Bucket(0.025, 15), Bucket(0.05, 20)),
      Seq(Bucket(0.01, 5), Bucket(0.025, 10), Bucket(0.05, 15), Bucket(0.1, 20)))
    val expected = Seq(Bucket(0.005, 15), Bucket(0.01, 35), Bucket(0.025, 55),
      Bucket(0.05, 35), Bucket(0.1, 20))
    assert(HistogramMath.mergeBuckets(groups) == expected)
  }

  private val expPos = Seq(ExpBucket(-2, 10), ExpBucket(-1, 20), ExpBucket(0, 100),
    ExpBucket(1, 50), ExpBucket(2, 15), ExpBucket(3, 5))

  test("exponential percentile positive (histogram_test.go:213-273)") {
    for (p <- Seq(50.0, 95.0)) {
      val Right(v) = HistogramMath.expPercentile(0, 0L, expPos, Nil, p)
      assert(v > 0, s"P$p should be positive, got $v")
    }
    val Right(v99) = HistogramMath.expPercentile(0, 10L, expPos, Nil, 99)
    assert(v99 > 0)
  }

  test("exp merge rescales to min scale with integer index division (percentile.go:227-297)") {
    val a = HistogramMath.ExpHist(2, 1L, 0.001, Seq(ExpBucket(4, 8), ExpBucket(5, 4)), Nil)
    val b = HistogramMath.ExpHist(0, 2L, 0.01, Seq(ExpBucket(1, 3)), Nil)
    val m = HistogramMath.mergeExpHistograms(Seq(a, b))
    assert(m.scale == 0)
    assert(m.zeroCount == 3L)
    assert(m.zeroThreshold == 0.01)
    assert(m.positive == Seq(ExpBucket(1, 15))) // 4/4=1 (8), 5/4=1 (4), 1 (3)
  }

  // --- seeded-random properties ---

  private def randomBuckets(rng: scala.util.Random): Seq[Bucket] = {
    val n = 1 + rng.nextInt(12)
    val bounds = rng.shuffle((1 to 40).toList).take(n).map(_ * 0.25).sorted
    bounds.map(le => Bucket(le, rng.nextLong(1000L)))
  }

  test("property: percentile is monotonic in p and within bucket range") {
    val rng = new scala.util.Random(42)
    for (_ <- 1 to 200) {
      val bs = randomBuckets(rng)
      if (bs.map(_.count).sum > 0) {
        val p1 = rng.nextDouble() * 100; val p2 = rng.nextDouble() * 100
        val (lo, hi) = (math.min(p1, p2), math.max(p1, p2))
        val Right(vLo) = HistogramMath.percentile(bs, lo)
        val Right(vHi) = HistogramMath.percentile(bs, hi)
        assert(vLo <= vHi + 1e-9, s"monotonic: $lo->$vLo vs $hi->$vHi over $bs")
        assert(vHi <= bs.map(_.le).max + 1e-9)
      }
    }
  }

  test("property: cumulativeToDelta . deltaToCumulative == identity (sorted)") {
    val rng = new scala.util.Random(43)
    for (_ <- 1 to 200) {
      val sorted = randomBuckets(rng).sortBy(_.le)
      assert(HistogramMath.cumulativeToDelta(HistogramMath.deltaToCumulative(sorted)) == sorted)
    }
  }

  test("property: mergeBuckets is order-insensitive") {
    val rng = new scala.util.Random(44)
    for (_ <- 1 to 200) {
      val a = randomBuckets(rng); val b = randomBuckets(rng)
      assert(HistogramMath.mergeBuckets(Seq(a, b)) == HistogramMath.mergeBuckets(Seq(b, a)))
    }
  }
}
