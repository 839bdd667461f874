package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Hashed-bigram feature buckets — the featurizer of DSIR-style importance
  * resampling (Xie et al. 2023, "Data Selection for Language Models via
  * Importance Resampling"): every adjacent token pair hashes into one of
  * `nBuckets` buckets, and a document's feature vector is its bucket
  * multiset. Downstream, per-bucket target/raw probability ratios turn the
  * multiset into an importance weight with one fused HOF sum.
  *
  * Hash contract (engine-portable, the [[WinnowFingerprintExpr]] family):
  * gram = left + ' ' + right; h = fold over the gram's CODE POINTS of
  * (h·B + cp) mod P with B = 1000003, P = 2³¹ − 1; bucket = h mod nBuckets.
  * All intermediates fit int64 (h < P, h·B ≈ 2.1e15). The DuckDB oracle
  * restates the identical fold with list_reduce + ord. Null tokens break
  * the pair chain (split() never yields them); fewer than two tokens → an
  * empty bucket array.
  *
  * Why native: one generated-code pass per row — no per-char interpreted
  * lambdas, no explode at featurize time; stays inside whole-stage codegen
  * at scan speed. */
case class HashedBigramBucketsExpr(child: Expression, nBuckets: Int)
    extends UnaryExpression {
  require(nBuckets >= 2, s"nBuckets must be >= 2 (got $nBuckets)")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hashed_bigram_buckets needs array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "hashed_bigram_buckets"

  override def nullSafeEval(input: Any): Any =
    HashedBigramBucketsExpr.compute(input.asInstanceOf[ArrayData], nBuckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.HashedBigramBucketsExpr.compute($arr, $nBuckets);")

  override protected def withNewChildInternal(newChild: Expression): HashedBigramBucketsExpr =
    copy(child = newChild)
}

object HashedBigramBucketsExpr {

  /** Poly-hash one gram string over code points — shared constants with
    * the winnowing fingerprints. */
  private def polyHash(s: String): Long = {
    val B = WinnowFingerprintExpr.B
    val P = WinnowFingerprintExpr.P
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * B + cp) % P
      i += Character.charCount(cp)
    }
    h
  }

  def compute(toks: ArrayData, nBuckets: Int): ArrayData = {
    val n = toks.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Int])
    val out = new java.util.ArrayList[Integer](n - 1)
    var prev: UTF8String = if (toks.isNullAt(0)) null else toks.getUTF8String(0)
    var i = 1
    while (i < n) {
      val cur = if (toks.isNullAt(i)) null else toks.getUTF8String(i)
      if (prev != null && cur != null) {
        val gram = prev.toString + " " + cur.toString
        out.add((polyHash(gram) % nBuckets).toInt)
      }
      prev = cur
      i += 1
    }
    val arr = new Array[Int](out.size())
    var j = 0
    while (j < arr.length) { arr(j) = out.get(j); j += 1 }
    new GenericArrayData(arr)
  }

  def buckets(tokens: Column, nBuckets: Int): Column =
    ColumnBridge.column(
      HashedBigramBucketsExpr(ColumnBridge.expression(tokens), nBuckets))
}
