package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.llm.Dedup
import graft.model.Tables

/** The native SimHash expression must be bit-identical to the HOF reference
  * shape (simHashVotes + packSimHash) — the banding join's correctness
  * argument (pigeonhole over 16-bit chunks) depends on both producing the
  * same fingerprints. */
class SimHash64ExprSpec extends SparkSpec {

  test("native fingerprint == HOF fingerprint on the documents corpus") {
    val docs = Tables.documents(spark, Sf).select(col("doc_id"), col("text"))
    val th = transform(graft.llm.TextAnalysis.tokens(col("text")),
      t => xxhash64(t))
    val both = docs.select(
        col("doc_id"),
        SimHash64Expr.simHash64(th).as("native"),
        Dedup.simHash(col("text")).as("hof"))
      .filter(col("native") =!= col("hof"))
    assert(both.count() === 0)
  }

  test("empty token-hash array yields all-negative votes (fingerprint 0)") {
    import spark.implicits._
    val out = Seq(Seq.empty[Long], Seq(-1L))
      .toDF("hs")
      .select(SimHash64Expr.simHash64(col("hs")).as("sh"))
      .collect().map(_.getLong(0))
    assert(out(0) === 0L)
    assert(out(1) === -1L) // single all-ones hash sets every bit
  }
}
