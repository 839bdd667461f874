package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.llm.Dedup

/** Band keys are internal join keys: the native long-chain hash and the HOF
  * string hash produce DIFFERENT key values but must induce the SAME
  * bucketing — equal slices collide, distinct slices don't (modulo 2^-64).
  * Pinned as candidate-set equality on the fixture corpus. */
class BandKeysExprSpec extends SparkSpec {

  test("native and HOF band keys induce identical candidate pair sets") {
    val sig = graft.queries.LlmQueries.docsNearDups(spark, Sf)
      .select(col("doc_id"), Dedup.shingleHashesNative(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"), MinHashSignatureExpr.signature(col("sh"), 64).as("sig"))
    def pairs(keyFn: org.apache.spark.sql.Column): Set[(Long, Long)] = {
      val banded = sig.select(col("doc_id"), explode(keyFn).as("bk"))
        .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
      banded.as("a")
        .join(banded.as("b"),
          col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id"), col("b.doc_id")).distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val native = pairs(Dedup.bandKeys(col("sig"), 16, 4))
    val hof = pairs(Dedup.bandKeysHof(col("sig"), 16, 4))
    assert(native === hof)
    assert(native.nonEmpty)
  }

  test("equal slices share a key; band index partitions the key space") {
    val r = spark.range(1).select(
        BandKeysExpr.keys(array((1 to 8).map(i => lit(i.toLong)): _*), 4, 2).as("a"),
        BandKeysExpr.keys(array((1 to 8).map(i => lit(i.toLong)): _*), 4, 2).as("b"))
      .selectExpr("a = b as same", "size(a) as n",
        "a[0].band as b0", "a[3].band as b3", "a[0].key = a[1].key as k01")
      .collect()(0)
    assert(r.getBoolean(0))      // deterministic
    assert(r.getInt(1) === 4)    // one entry per band
    assert(r.getInt(2) === 0 && r.getInt(3) === 3)
    assert(!r.getBoolean(4))     // distinct slices → distinct keys
  }
}
