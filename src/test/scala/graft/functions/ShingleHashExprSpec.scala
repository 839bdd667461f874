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

  test("null token elements hash like xxhash64(null) — the seed passes through") {
    // the HOF twin folds a null operand to the seed; the native loop must
    // match instead of NPE-ing on getUTF8String (tokenizers never emit null,
    // but the type check admits containsNull arrays)
    val withNull = array(lit("alpha"), lit(null).cast("string"), lit("beta"))
    val th = transform(withNull, t => xxhash64(t))
    val w2Hof = zip_with( // the shifted-slice window chain for n = 2
      slice(th, lit(1), greatest(size(th) - 1, lit(0))),
      slice(th, lit(2), greatest(size(th) - 1, lit(0))),
      (a, b) => xxhash64(a, b))
    val rows = spark.range(1).select(
        ShingleHashExpr.tokenHashes(withNull).as("native"),
        th.as("hof"),
        ShingleHashExpr.windows(withNull, 2).as("w2_native"),
        w2Hof.as("w2_hof"))
      .collect()(0)
    assert(rows.getSeq[Long](0) === rows.getSeq[Long](1))
    assert(rows.getSeq[Long](2) === rows.getSeq[Long](3))
  }

  test("downstream null-skip: sig/band/simhash over nullable arrays equal the null-free twin") {
    // the parquet round-trip shape: array<bigint> comes back containsNull —
    // a null element must be skipped identically by all three consumers
    val withNull = array(lit(11L), lit(null).cast("long"), lit(22L), lit(33L))
    val noNull = array(lit(11L), lit(22L), lit(33L))
    val r = spark.range(1).select(
        MinHashSignatureExpr.signature(withNull, 8).as("sig_n"),
        MinHashSignatureExpr.signature(noNull, 8).as("sig"),
        SimHash64Expr.simHash64(withNull).as("sh_n"),
        SimHash64Expr.simHash64(noNull).as("sh"),
        BandKeysExpr.keys(withNull, 2, 2).as("bk_n"),
        MinHashSignatureExpr.signature(
          array(lit(null).cast("long"), lit(null).cast("long")), 8).as("all_null"))
      .collect()(0)
    assert(r.getSeq[Long](0) === r.getSeq[Long](1))
    assert(r.getLong(2) === r.getLong(3))
    // band 0 chains 11,skip(null); band 1 chains 22,33 — no NPE, no garbage
    assert(r.getSeq[org.apache.spark.sql.Row](4).length === 2)
    assert(r.isNullAt(5)) // no contributing element → NULL signature
  }
}
