package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.llm.Dedup

/** The native agreement count must equal the HOF shape on real MinHash
  * signatures — est_jaccard (agreement/k) drives the near-dup keep/drop
  * decision. */
class ArrayEqCountExprSpec extends SparkSpec {

  test("native eq-count == HOF eq-count on MinHash signature pairs") {
    val sig = graft.queries.LlmQueries.docsNearDups(spark, Sf)
      .select(col("doc_id"),
        Dedup.shingleHashesNative(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"),
        MinHashSignatureExpr.signature(col("sh"), 64).as("sig"))
    // sample pairs by id stride (cheap deterministic cross-section)
    val a = sig.filter(col("doc_id") % 17 === 0).select(
      col("doc_id").as("id_a"), col("sig").as("sig_a"))
    val b = sig.filter(col("doc_id") % 13 === 0).select(
      col("doc_id").as("id_b"), col("sig").as("sig_b"))
    val diff = a.crossJoin(b)
      .select(
        ArrayEqCountExpr.eqCount(col("sig_a"), col("sig_b")).as("native"),
        size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y),
          eq => eq)).as("hof"))
      .filter(col("native") =!= col("hof"))
    assert(diff.count() === 0)
  }

  test("edge shapes: identical, disjoint, ragged lengths") {
    val r = spark.range(1).select(
        ArrayEqCountExpr.eqCount(
          array(lit(1L), lit(2L), lit(3L)), array(lit(1L), lit(2L), lit(3L))).as("same"),
        ArrayEqCountExpr.eqCount(
          array(lit(1L), lit(2L)), array(lit(3L), lit(4L))).as("none"),
        ArrayEqCountExpr.eqCount(
          array(lit(1L), lit(2L), lit(9L)), array(lit(1L))).as("ragged"))
      .collect()(0)
    assert(r.getInt(0) === 3)
    assert(r.getInt(1) === 0)
    assert(r.getInt(2) === 1)
  }
}
