package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Native integer squared-L2 ≡ the HOF fold it replaces — exact value
  * parity, null poisoning, length mismatch. */
class L2SqExprSpec extends SparkSpec {

  test("native l2sq ≡ HOF fold on 300 random integer vector pairs") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(43)
    val rows = (1 to 300).map { _ =>
      val n = 1 + rnd.nextInt(96)
      (Seq.fill(n)((rnd.nextInt(2001) - 1000).toLong),
        Seq.fill(n)((rnd.nextInt(2001) - 1000).toLong))
    }
    val got = rows.toDF("a", "b")
      .select(
        L2SqExpr.l2sq(col("a"), col("b")).as("native"),
        graft.llm.Similarity.l2sqHof(col("a"), col("b")).as("hof"))
      .collect()
    got.foreach { r => assert(r.getLong(0) === r.getLong(1)) }
  }

  test("length mismatch and null elements poison to NULL like the HOF") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (Seq[java.lang.Long](1L, 2L), Seq[java.lang.Long](3L)),
      (Seq[java.lang.Long](1L, null), Seq[java.lang.Long](3L, 4L)),
      (Seq[java.lang.Long](), Seq[java.lang.Long]())
    ).toDF("a", "b")
      .select(
        L2SqExpr.l2sq(col("a").cast("array<long>"),
          col("b").cast("array<long>")).as("native"),
        graft.llm.Similarity.l2sqHof(col("a").cast("array<long>"),
          col("b").cast("array<long>")).as("hof"))
      .collect()
    assert(df(0).isNullAt(0) && df(0).isNullAt(1), "length mismatch")
    assert(df(1).isNullAt(0) && df(1).isNullAt(1), "null element")
    assert(df(2).getLong(0) === 0L && df(2).getLong(1) === 0L,
      "empty vectors fold to the 0 seed")
  }
}
