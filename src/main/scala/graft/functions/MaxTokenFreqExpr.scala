package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Maximum token multiplicity in one pass — the repetition signal of a
  * Gopher-style quality filter (a document whose most frequent token
  * dominates its length is boilerplate/spam, whatever its other stats say).
  *
  * Why native: the readable HOF shape
  * (`array_max(transform(array_distinct(toks), x -> size(filter(toks,
  * y -> y = x))))`) is O(distinct·n) interpreted lambdas per row; this is
  * one hash-counting walk inside whole-stage codegen. Null elements are
  * skipped (split() never produces them); an empty array scores 0.
  * Pinned bit-identical to the HOF twin by TokenStatsExprSpec. */
case class MaxTokenFreqExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"max_token_freq needs array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "max_token_freq"

  override def nullSafeEval(input: Any): Any =
    MaxTokenFreqExpr.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.MaxTokenFreqExpr.compute($arr);")

  override protected def withNewChildInternal(newChild: Expression): MaxTokenFreqExpr =
    copy(child = newChild)
}

object MaxTokenFreqExpr {

  def compute(toks: ArrayData): Int = {
    val n = toks.numElements()
    val counts = new java.util.HashMap[UTF8String, Integer](n * 2)
    var max = 0
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val t = toks.getUTF8String(i)
        val c = counts.merge(t, 1, (a, b) => a + b)
        if (c > max) max = c
      }
      i += 1
    }
    max
  }

  def maxFreq(tokens: Column): Column =
    ColumnBridge.column(MaxTokenFreqExpr(ColumnBridge.expression(tokens)))
}
