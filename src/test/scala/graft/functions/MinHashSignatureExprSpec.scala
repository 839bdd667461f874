package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** The native MinHash expression: codegen and interpreted paths must agree
  * with each other and with a direct Scala model of the fold. */
class MinHashSignatureExprSpec extends SparkSpec {

  private val K = 16

  private def model(hs: Seq[Long]): Seq[Long] =
    (0 until K).map { s =>
      if (hs.isEmpty) Long.MaxValue
      else hs.map(h => XXH64.hashLong(h, s.toLong)).min
    }

  private val fixtures: Seq[Seq[Long]] = Seq(
    Seq(1L, 2L, 3L),
    Seq(-5L, Long.MaxValue, 0L, 42L),
    Seq(7L),
    Seq.empty[Long])

  test("interpreted eval matches the Scala model (incl. empty array)") {
    val e = MinHashSignatureExpr(
      org.apache.spark.sql.catalyst.expressions.Literal(
        new GenericArrayData(Array(1L, 2L, 3L)), ArrayType(LongType)), K)
    fixtures.foreach { hs =>
      val out = e.nullSafeEval(new GenericArrayData(hs.toArray))
        .asInstanceOf[ArrayData].toLongArray.toSeq
      assert(out === model(hs), s"input $hs")
    }
  }

  test("codegen path (DataFrame) matches the Scala model; null in → null out") {
    // containsNull = true (the parquet round-trip shape): null ELEMENTS are
    // skipped by contract; a null ARRAY is null-out, tested below
    val schema = StructType(Seq(StructField("hs", ArrayType(LongType))))
    import scala.jdk.CollectionConverters._
    val rows = (fixtures.map(Row(_)) :+ Row(null)).asJava
    val df = spark.createDataFrame(rows, schema)
      .select(MinHashSignatureExpr.signature(col("hs"), K).as("sig"))
    val got = df.collect().map(r =>
      if (r.isNullAt(0)) null else r.getSeq[Long](0))
    fixtures.zip(got).foreach { case (hs, sig) =>
      assert(sig === model(hs), s"input $hs")
    }
    assert(got.last === null)
  }

  test("signature positions are per-seed independent (no shared-min collapse)") {
    // Two disjoint hash sets must not agree on most positions — the KM
    // failure mode this design guards against.
    val a = model(Seq(11L, 22L, 33L, 44L))
    val b = model(Seq(55L, 66L, 77L, 88L))
    val agree = a.zip(b).count { case (x, y) => x == y }
    assert(agree <= 2, s"disjoint sets agree on $agree/$K positions")
  }
}
