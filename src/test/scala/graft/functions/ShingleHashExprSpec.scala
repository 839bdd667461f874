package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.llm.Dedup
import graft.model.Tables

/** The native shingle-hash expression must be bit-identical to the HOF
  * reference shape (transform + chained zip_with in Dedup.shingleHashes) —
  * MinHash signatures, band keys, and therefore the candidate-pair set all
  * derive from these hashes. */
class ShingleHashExprSpec extends SparkSpec {

  test("native shingle hashes == HOF shingle hashes on the documents corpus") {
    val docs = Tables.documents(spark, Sf).select(col("doc_id"), col("text"))
    for (n <- Seq(1, 3)) {
      val diff = docs.select(
          col("doc_id"),
          Dedup.shingleHashesNative(col("text"), n).as("native"),
          Dedup.shingleHashes(col("text"), n).as("hof"))
        .filter(not(col("native") === col("hof")))
      assert(diff.count() === 0, s"n=$n")
    }
  }

  test("n=1 windows equal per-token xxhash64; short rows yield empty windows") {
    import spark.implicits._
    val df = Seq("alpha beta", "x", "").toDF("text")
      .select(
        ShingleHashExpr.tokenHashes(split(col("text"), " ")).as("th_native"),
        transform(split(col("text"), " "), t => xxhash64(t)).as("th_hof"),
        ShingleHashExpr.windows(split(col("text"), " "), 3).as("w3"))
    val rows = df.collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) === r.getSeq[Long](1))
    }
    assert(rows(0).getSeq[Long](2).isEmpty)   // 2 tokens < n=3
    assert(rows(1).getSeq[Long](2).isEmpty)
  }
}
