package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}

/** Native hashed word-n-gram shingles: token hashing + the n-window hash
  * chain of [[graft.llm.Dedup.shingleHashes]] fused into one generated loop.
  *
  * Bit-identical by construction to the HOF reference shape (pinned by
  * ShingleHashExprSpec):
  *   - per-token hash  = xxhash64(token)           = hashUTF8String(t, 42)
  *   - window chain    = xxhash64(acc, nextTokHash)
  *                     = hashLong(next, hashLong(acc, 42)), applied n−1 times
  *   - n = 1 degenerates to plain token hashes (the `transform(toks,
  *     t => xxhash64(t))` stage the SimHash path shares).
  *
  * Why native: the HOF form's `transform` + chained `zip_with` stages are
  * interpreted (lambda expressions have no doGenCode), which left the shingle
  * derivation as the last interpreted stage of the MinHash dedup pipeline —
  * the ~0.5 µs/element floor documented in [[MinHashSignatureExpr]]. Here the
  * whole derivation is a tight generated loop allocating one long[] of token
  * hashes and one long[] of windows per row, inside WholeStageCodegen.
  *
  * Output intentionally does NOT dedupe — compose with Spark's own
  * `array_distinct` exactly where the HOF shape did, so the two forms stay
  * interchangeable term-for-term.
  */
case class ShingleHashExpr(child: Expression, n: Int)
    extends UnaryExpression {

  require(n > 0, "n must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes needs array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType,
    containsNull = false)
  override def prettyName: String = "shingle_hashes"

  private val Seed = 42L

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val s = arr.numElements()
    val th = new Array[Long](s)
    var i = 0
    while (i < s) {
      // xxhash64 of a null operand folds to the seed — mirror it for null
      // elements instead of NPE-ing on getUTF8String
      th(i) = if (arr.isNullAt(i)) Seed
        else XXH64.hashUTF8String(arr.getUTF8String(i), Seed)
      i += 1
    }
    val len = math.max(s - (n - 1), 0)
    val out = new Array[Long](len)
    i = 0
    while (i < len) {
      var acc = th(i)
      var j = 1
      while (j < n) {
        acc = XXH64.hashLong(th(i + j), XXH64.hashLong(acc, Seed))
        j += 1
      }
      out(i) = acc
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val s = ctx.freshName("s")
      val th = ctx.freshName("th")
      val len = ctx.freshName("len")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      val xxh = classOf[XXH64].getName
      s"""
         |int $s = $arr.numElements();
         |long[] $th = new long[$s];
         |for (int $i = 0; $i < $s; $i++) {
         |  $th[$i] = $arr.isNullAt($i) ? ${Seed}L
         |    : $xxh.hashUTF8String($arr.getUTF8String($i), ${Seed}L);
         |}
         |int $len = $s - ${n - 1}; if ($len < 0) $len = 0;
         |long[] $out = new long[$len];
         |for (int $i = 0; $i < $len; $i++) {
         |  long $acc = $th[$i];
         |  for (int $j = 1; $j < $n; $j++) {
         |    $acc = $xxh.hashLong($th[$i + $j], $xxh.hashLong($acc, ${Seed}L));
         |  }
         |  $out[$i] = $acc;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ShingleHashExpr =
    copy(child = newChild)
}

object ShingleHashExpr {
  /** Raw (non-distinct) hashed n-gram windows of a token-array column. */
  def windows(tokens: Column, n: Int): Column =
    ColumnBridge.column(ShingleHashExpr(ColumnBridge.expression(tokens), n))

  /** Per-token xxhash64 — the n = 1 degenerate, shared by the SimHash path. */
  def tokenHashes(tokens: Column): Column = windows(tokens, 1)
}
