package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.llm.Similarity
import graft.model.Tables

/** Native cosine must be floating-point-identical to the HOF fold — scores
  * decide ANN ranks and near-dup thresholds, and the oracle roundings assume
  * the fold's exact accumulation order. */
class CosineSimilarityExprSpec extends SparkSpec {

  test("native == HOF bit-for-bit on corpus pairs") {
    val emb = Tables.embeddings(spark, Sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("vec"))
    val pairs = emb.as("a").join(emb.as("b"),
      col("a.vec_id") + 1 === col("b.vec_id")) // adjacent pairs, no blowup
    val diff = pairs.select(
        CosineSimilarityExpr.cosine(col("a.vec"), col("b.vec")).as("native"),
        Similarity.cosineHof(col("a.vec"), col("b.vec")).as("hof"))
      .filter(col("native") =!= col("hof")) // exact, not approximate
    assert(diff.count() === 0)
  }

  test("identical vectors score 1.0; mismatched lengths are NULL") {
    import spark.implicits._
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0, 3.0)),
      (Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0)))
      .toDF("a", "b")
      .select(CosineSimilarityExpr.cosine(col("a"), col("b")).as("c"))
      .collect()
    assert(df(0).getDouble(0) === 1.0)
    assert(df(1).isNullAt(0))
  }

  test("a null element poisons the score to NULL, like the HOF fold") {
    val a = array(lit(1.0), lit(null).cast("double"), lit(3.0))
    val b = array(lit(1.0), lit(2.0), lit(3.0))
    val r = spark.range(1).select(
        CosineSimilarityExpr.cosine(a, b).as("native"),
        Similarity.cosineHof(a, b).as("hof"))
      .collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1))
  }
}
