package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Native dot product ≡ the HOF left-fold it replaces — bit-exact fp
  * parity (oracles restate the fold), null poisoning, length mismatch. */
class DotProductExprSpec extends SparkSpec {

  test("native dot ≡ HOF fold bit-for-bit on 300 random vector pairs") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(41)
    val rows = (1 to 300).map { _ =>
      val n = 1 + rnd.nextInt(96)
      (Seq.fill(n)(rnd.nextDouble() * 2 - 1), Seq.fill(n)(rnd.nextDouble() * 2 - 1))
    }
    val got = rows.toDF("a", "b")
      .select(
        DotProductExpr.dot(col("a"), col("b")).as("native"),
        graft.llm.Similarity.dotHof(col("a"), col("b")).as("hof"))
      .collect()
    got.foreach { r =>
      // bit-exact, not approx: the expressions must run the same fp ops
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
    }
  }

  test("length mismatch and null elements poison to NULL like the HOF") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](3.0)),
      (Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](3.0, 4.0)),
      (Seq[java.lang.Double](), Seq[java.lang.Double]())
    ).toDF("a", "b")
      .select(
        DotProductExpr.dot(col("a").cast("array<double>"),
          col("b").cast("array<double>")).as("native"),
        graft.llm.Similarity.dotHof(col("a").cast("array<double>"),
          col("b").cast("array<double>")).as("hof"))
      .collect()
    assert(df(0).isNullAt(0) && df(0).isNullAt(1), "length mismatch")
    assert(df(1).isNullAt(0) && df(1).isNullAt(1), "null element")
    assert(df(2).getDouble(0) === 0.0 && df(2).getDouble(1) === 0.0,
      "empty vectors dot to the 0.0 seed")
  }
}
