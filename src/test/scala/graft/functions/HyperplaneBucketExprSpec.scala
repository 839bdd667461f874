package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.llm.Similarity
import graft.model.Tables

/** Native hyperplane bucket must be bit-identical to the per-plane HOF fold
  * — LSH bucket membership decides candidate generation for ANN and
  * embedding near-dup, so the two shapes may never disagree on a sign. */
class HyperplaneBucketExprSpec extends SparkSpec {

  test("native bucket == HOF bucket across the embeddings corpus (12 and 16 bits)") {
    val emb = Tables.embeddings(spark, Sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("vec"))
    Seq(12, 16).foreach { nBits =>
      val diff = emb.select(
          HyperplaneBucketExpr.bucket(col("vec"), nBits).as("native"),
          Similarity.lshBucketHof(col("vec"), nBits).as("hof"))
        .filter(col("native") =!= col("hof"))
      assert(diff.count() === 0, s"nBits=$nBits")
    }
  }

  test("empty vector: all projections are +0.0, every sign bit set") {
    import spark.implicits._
    val out = Seq(Seq.empty[Double]).toDF("vec")
      .select(HyperplaneBucketExpr.bucket(col("vec"), 4).as("b"))
      .collect()(0).getLong(0)
    assert(out === 0xFL) // proj 0.0 >= 0 for all 4 planes
  }

  test("a null element nulls every plane's fold — bucket 0, like the HOF") {
    val v = array(lit(1.0), lit(null).cast("double"))
    val r = spark.range(1).select(
        HyperplaneBucketExpr.bucket(v, 4).as("native"),
        Similarity.lshBucketHof(v, 4).as("hof"))
      .collect()(0)
    assert(r.getLong(0) === 0L)
    assert(r.getLong(1) === 0L)
  }
}
