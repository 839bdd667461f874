package graft.transport

import org.scalatest.funsuite.AnyFunSuite

import graft.transport.OtlpProto.{Datapoint, Exemplar, ResourceRow}

/** Randomized encode→decode round-trips for the OTLP protobuf codec, the
  * same trust layer RemoteReadServerSpec's fuzz gives PromProto: hundreds of
  * random exports over every metric kind, value-oneof arm, optional-field
  * combination, and extreme double/long, all of which must survive the wire
  * bit-for-bit. The generator emits models in the codec's canonical form
  * (the form `decodeExportRequest` produces — e.g. histogram bucket_counts
  * always Some, empty bounds as None), which is exactly the invariant the
  * receiver relies on. */
class OtlpProtoFuzzSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(20260814)

  private def rs(maxLen: Int = 12): String = {
    val n = rnd.nextInt(maxLen)
    (0 until n).map(_ => (rnd.nextInt(0xD7FF - 32) + 32).toChar).mkString
  }

  private def rDouble(): Double = rnd.nextInt(8) match {
    case 0 => 0.0
    case 1 => -0.0
    case 2 => Double.PositiveInfinity
    case 3 => Double.NegativeInfinity
    case 4 => Double.MinPositiveValue
    case 5 => Double.MaxValue
    case _ => (rnd.nextDouble() - 0.5) * 1e12
  }

  private def rTsMs(): Long = rnd.nextLong(4102444800000L) // < year 2100

  private def rAttrs(): Map[String, String] = {
    val n = rnd.nextInt(4)
    (0 until n).map { i =>
      // distinct keys (maps dedup); values include null — the stringify arm
      // for unmodeled AnyValue kinds
      (s"k$i${rs(4)}", if (rnd.nextInt(6) == 0) null else rs())
    }.toMap
  }

  private def rExemplars(kind: String): Option[Seq[Exemplar]] =
    if (kind == "summary" || rnd.nextInt(3) == 0) None
    else Some(Seq.fill(rnd.nextInt(3) + 1) {
      val span = if (rnd.nextBoolean()) Some(f"${rnd.nextLong()}%016x") else None
      val trace = if (rnd.nextBoolean())
        Some(f"${rnd.nextLong()}%016x${rnd.nextLong()}%016x") else None
      Exemplar(span, trace, rDouble(), rTsMs(), rAttrs())
    })

  private def rDatapoint(i: Int): Datapoint = {
    val kind = Seq("gauge", "sum", "histogram",
      "exponential_histogram", "summary")(rnd.nextInt(5))
    val temp = if (kind == "gauge" || kind == "summary") 0 else rnd.nextInt(3)
    val mono = kind == "sum" && rnd.nextBoolean()
    val (vInt, vDouble) =
      if (kind == "gauge" || kind == "sum") rnd.nextInt(3) match {
        case 0 => (Some(rnd.nextLong()), None)
        case 1 => (None, Some(rDouble()))
        case _ => (None, None)
      } else (None, None)
    val (count, sum) =
      if (kind == "gauge" || kind == "sum") (None, None)
      else (
        if (rnd.nextBoolean()) Some(rnd.nextLong(1L << 40)) else None,
        if (rnd.nextBoolean()) Some(rDouble()) else None)
    val (bounds, counts) =
      if (kind == "histogram") {
        val nb = rnd.nextInt(5)
        (if (nb == 0) None else Some(Seq.fill(nb)(rDouble())),
          Some(Seq.fill(rnd.nextInt(6))(rnd.nextLong(1L << 30))))
      } else (None, None)
    // distinct metric names keep encode's run-grouping trivially faithful;
    // the shared-run case is pinned separately below
    Datapoint(s"m$i${rs(6)}", kind, rTsMs(), temp, mono, vInt, vDouble,
      count, sum, bounds, counts, rAttrs(), rExemplars(kind))
  }

  test("random exports round-trip the wire bit-for-bit (300 rounds)") {
    for (_ <- 1 to 300) {
      val rows = Seq.fill(rnd.nextInt(3) + 1)(
        ResourceRow(rAttrs(), Seq.tabulate(rnd.nextInt(5))(rDatapoint)))
      val decoded = OtlpProto.decodeExportRequest(
        OtlpProto.encodeExportRequest(rows))
      assert(decoded === rows)
    }
  }

  test("a multi-datapoint series shares one Metric message and round-trips") {
    // same (metric, kind, temporality, monotonicity) run — the encoder
    // folds it into one wire message, the decoder fans it back out
    val run = (0 until 5).map(i =>
      Datapoint("requests_total", "sum", 1700000000000L + i * 1000, 2,
        isMonotonic = true, valueInt = None, valueDouble = Some(i * 1.5),
        count = None, sum = None, bounds = None, bucketCounts = None,
        dpAttrs = Map("host" -> s"h$i"), exemplars = None))
    val rows = Seq(ResourceRow(Map("service.name" -> "svc"), run))
    val bytes = OtlpProto.encodeExportRequest(rows)
    assert(OtlpProto.decodeExportRequest(bytes) === rows)
  }
}
