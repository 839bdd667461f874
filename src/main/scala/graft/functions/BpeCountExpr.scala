package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native pinned-vocab subword counting for [[graft.llm.Bpe]]: `bigint`
  * total of greedy longest-match segment counts over a token array, in one
  * pass inside whole-stage codegen.
  *
  * Why native: subword budgeting runs at corpus-scan scale in the packing
  * and corpus-stats paths, and greedy segmentation is a per-position
  * longest-match loop no HOF composition expresses without quadratic
  * re-slicing. Pinned element-wise equal to the Scala reference
  * ([[graft.llm.Bpe.countToken]]) by BpeSpec.
  *
  * Walks CODE POINTS (matching the oracle's substr/len and the LangId
  * window convention) — a supplementary character is one position. */
case class BpeCountExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_count needs array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "bpe_count"

  override def nullSafeEval(input: Any): Any =
    BpeCountExpr.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.BpeCountExpr.compute($arr);")

  override protected def withNewChildInternal(newChild: Expression): BpeCountExpr =
    copy(child = newChild)
}

object BpeCountExpr {

  private lazy val vocab: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    graft.llm.Bpe.vocab.keys.foreach(s.add)
    s
  }

  /** Shared by eval and generated code: Σ per-token greedy counts, with a
    * null array element counting like an empty token (floor 1). */
  def compute(tokens: ArrayData): Long = {
    val minG = graft.llm.Bpe.MinGram
    val maxG = graft.llm.Bpe.MaxGram
    var total = 0L
    var t = 0
    val n = tokens.numElements()
    while (t < n) {
      val u = tokens.getUTF8String(t)
      val cps =
        if (u == null) Array.empty[Int] else u.toString.codePoints().toArray
      var i = 0
      var cnt = 0L
      while (i < cps.length) {
        var consumed = 1
        var l = math.min(maxG, cps.length - i)
        var found = false
        while (!found && l >= minG) {
          if (vocab.contains(new String(cps, i, l))) { consumed = l; found = true }
          l -= 1
        }
        i += consumed
        cnt += 1L
      }
      total += math.max(1L, cnt)
      t += 1
    }
    total
  }

  def count(tokens: Column): Column =
    ColumnBridge.column(BpeCountExpr(ColumnBridge.expression(tokens)))
}
