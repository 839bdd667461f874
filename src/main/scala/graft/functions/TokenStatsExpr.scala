package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass token statistics for the text-analysis battery:
  * `struct<n_tokens:int, n_distinct:int, stop_cnt:int, subwords:bigint>`
  * from one walk over the token array.
  *
  * Field semantics, bit-identical to the HOF shapes in
  * [[graft.llm.TextAnalysis]] (pinned by TokenStatsExprSpec):
  *   - n_tokens   = size(toks)
  *   - n_distinct = size(array_distinct(toks))        (string equality)
  *   - stop_cnt   = size(filter(toks, isin(stopwords)))
  *   - subwords   = aggregate(toks, 0L, acc + greatest(1, ceil(len/4)))
  *                  (len = character count, the ~4-chars/token heuristic)
  *
  * Why native: the stats run at corpus-scan scale (every document, every
  * row), and the HOF forms are three separate interpreted collection ops per
  * row plus a fold — with the stopword filter paying |stopwords| isin probes
  * per token. Here: one loop, a hash set for distinct, a hash set for the
  * stopword lookup (built once per expression instance), all inside
  * whole-stage codegen via a shared helper.
  */
case class TokenStatsExpr(child: Expression, stopwords: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_stats needs array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("stop_cnt", IntegerType, nullable = false),
    StructField("subwords", LongType, nullable = false)))
  override def prettyName: String = "token_stats"

  @transient private lazy val stopSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](stopwords.size * 2)
    stopwords.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override def nullSafeEval(input: Any): Any =
    TokenStatsExpr.compute(input.asInstanceOf[ArrayData], stopSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("stopSet", stopSet,
      classOf[java.util.HashSet[UTF8String]].getName)
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.TokenStatsExpr.compute($arr, $setRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenStatsExpr =
    copy(child = newChild)
}

object TokenStatsExpr {

  /** Shared by eval and generated code.
    *
    * Null elements mirror the HOF shapes exactly: `size` counts them
    * (n_tokens), `array_distinct` keeps null as one distinct value
    * (n_distinct), `filter(isin(...))` drops them (stop_cnt), and the
    * subword fold's `greatest(1L, ceil(length(null)/4))` skips the null
    * operand and contributes 1. */
  def compute(toks: ArrayData, stopSet: java.util.HashSet[UTF8String]): InternalRow = {
    val n = toks.numElements()
    val seen = new java.util.HashSet[UTF8String](n * 2)
    var sawNull = false
    var stop = 0
    var subwords = 0L
    var i = 0
    while (i < n) {
      if (toks.isNullAt(i)) {
        sawNull = true
        subwords += 1L
      } else {
        val t = toks.getUTF8String(i)
        seen.add(t)
        if (stopSet.contains(t)) stop += 1
        val chars = t.numChars()
        val units = (chars + 3) / 4 // = ceil(chars/4) for non-negative chars
        subwords += (if (units < 1) 1L else units.toLong)
      }
      i += 1
    }
    val distinct = seen.size() + (if (sawNull) 1 else 0)
    new GenericInternalRow(Array[Any](n, distinct, stop, subwords))
  }

  def stats(tokens: Column, stopwords: Seq[String]): Column =
    ColumnBridge.column(
      TokenStatsExpr(ColumnBridge.expression(tokens), stopwords))
}
