package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** The native MinHash expression: codegen and interpreted paths must agree
  * with each other and with a direct Scala model of the fold; null elements
  * are skipped, and a no-contribution array yields a NULL signature. */
class MinHashSignatureExprSpec extends SparkSpec {

  private val K = 16

  /** None when no non-null element contributes (empty / all-null input). */
  private def model(hs: Seq[Option[Long]]): Option[Seq[Long]] = {
    val present = hs.flatten
    if (present.isEmpty) None
    else Some((0 until K).map { s =>
      present.map(h => XXH64.hashLong(h, s.toLong)).min
    })
  }

  private val fixtures: Seq[Seq[Option[Long]]] = Seq(
    Seq(1L, 2L, 3L).map(Some(_)),
    Seq(-5L, Long.MaxValue, 0L, 42L).map(Some(_)),
    Seq(Some(7L), None, Some(9L)), // null element skipped
    Seq(7L).map(Some(_)),
    Seq(None, None),               // all-null → NULL signature
    Seq.empty)                     // empty → NULL signature

  test("interpreted eval matches the Scala model (incl. empty / null elements)") {
    val e = MinHashSignatureExpr(
      org.apache.spark.sql.catalyst.expressions.Literal(
        new GenericArrayData(Array(1L, 2L, 3L)), ArrayType(LongType)), K)
    fixtures.foreach { hs =>
      val out = Option(e.nullSafeEval(
          new GenericArrayData(hs.map(_.map(Long.box).orNull).toArray[Any])))
        .map(_.asInstanceOf[ArrayData].toLongArray.toSeq)
      assert(out === model(hs), s"input $hs")
    }
  }

  test("codegen path (DataFrame) matches the Scala model; null in → null out") {
    // containsNull = true (the parquet round-trip shape)
    val schema = StructType(Seq(StructField("hs", ArrayType(LongType))))
    import scala.jdk.CollectionConverters._
    val rows = (fixtures.map(hs => Row(hs.map(_.map(Long.box).orNull))) :+ Row(null)).asJava
    val df = spark.createDataFrame(rows, schema)
      .select(MinHashSignatureExpr.signature(col("hs"), K).as("sig"))
    val got = df.collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getSeq[Long](0)))
    fixtures.zip(got).foreach { case (hs, sig) =>
      assert(sig === model(hs), s"input $hs")
    }
    assert(got.last === None)
  }

  test("signature positions are per-seed independent (no shared-min collapse)") {
    // Two disjoint hash sets must not agree on most positions — the KM
    // failure mode this design guards against.
    val a = model(Seq(11L, 22L, 33L, 44L).map(Some(_))).get
    val b = model(Seq(55L, 66L, 77L, 88L).map(Some(_))).get
    val agree = a.zip(b).count { case (x, y) => x == y }
    assert(agree <= 2, s"disjoint sets agree on $agree/$K positions")
  }
}
