package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Subword count under a LEARNED BPE merge list — the native form of
  * [[graft.llm.Bpe.learnedSubwordCount]]'s HOF chain (which replays four
  * wrapped string replaces per merge per token in interpreted lambdas and
  * benched as the engine's 3rd-slowest query at sf0.1). The merge list is
  * the same driver-side literal state ([[LmModelNllExpr]]'s contract);
  * each token char-splits to symbols, the merges replay in rank order at
  * the SYMBOL level (exactly the trainer's non-overlapping left-to-right
  * apply — the r14 ADVICE contract), and the surviving symbol count is
  * the token's subword count. An empty token counts 1, matching the HOF
  * twin's split('', sep) floor; BpeSpec pins native ≡ HOF. */
case class LearnedBpeCountExpr(child: Expression,
    merges: Seq[(String, String)]) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"learned_bpe_count needs array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "learned_bpe_count"

  @transient private lazy val mergeArr: Array[(String, String)] = merges.toArray

  override def nullSafeEval(input: Any): Any =
    LearnedBpeCountExpr.compute(input.asInstanceOf[ArrayData], mergeArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // RAW scala.Tuple2[] cast (r21): Janino cannot parse a generic-ARRAY
    // cast — "(scala.Tuple2<String, String>[]) references[i]" failed to
    // compile ("')' expected instead of '['") and the whole stage silently
    // fell back to interpreted mode, which is exactly the non-codegen hot
    // path this expression exists to avoid. compute's erased signature
    // takes Tuple2[], so the raw cast is the correct generated Java.
    val ref = ctx.addReferenceObj("bpeMerges", mergeArr, "scala.Tuple2[]")
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.LearnedBpeCountExpr.compute($arr, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): LearnedBpeCountExpr =
    copy(child = newChild)
}

object LearnedBpeCountExpr {

  def compute(toks: ArrayData, merges: Array[(String, String)]): Long = {
    val n = toks.numElements()
    var total = 0L
    var i = 0
    while (i < n) {
      val tok = if (toks.isNullAt(i)) "" else toks.getUTF8String(i).toString
      if (tok.isEmpty) total += 1L
      else {
        // code-POINT symbols: Spark's split(t, '') never splits a
        // surrogate pair (BpeSpec pins this against the HOF twin on
        // emoji), and DuckDB's string_split(t, '') is per-character too —
        // the cross-engine contract is code points
        val cps = tok.codePoints().toArray
        var syms = new Array[String](cps.length)
        var k = 0
        while (k < cps.length) {
          syms(k) = new String(Character.toChars(cps(k))); k += 1
        }
        var len = syms.length
        var m = 0
        while (m < merges.length) {
          val l = merges(m)._1
          val r = merges(m)._2
          val out = new Array[String](len)
          var w = 0
          var j = 0
          while (j < len) {
            if (j + 1 < len && syms(j) == l && syms(j + 1) == r) {
              out(w) = l + r; w += 1; j += 2
            } else { out(w) = syms(j); w += 1; j += 1 }
          }
          syms = out
          len = w
          m += 1
        }
        total += len
      }
      i += 1
    }
    total
  }

  def count(tokens: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(
      LearnedBpeCountExpr(ColumnBridge.expression(tokens), merges))
}
