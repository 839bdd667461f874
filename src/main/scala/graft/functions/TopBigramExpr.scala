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

/** Most frequent adjacent word 2-gram in one pass — Gopher's top-n-gram
  * coverage signal (Rae et al. 2021 §A1.1): a document whose top bigram
  * covers most of its characters is one phrase repeated.
  *
  * Contract (pinned equal to the HOF twin
  * [[graft.llm.TextAnalysis.topBigramHof]] by GopherSpec): grams are
  * space-joined adjacent token pairs; the winner is (count DESC, gram ASC)
  * with binary string order — the same tie DuckDB's `ORDER BY c DESC,
  * gram` states; fewer than two tokens → (0, ''). Null tokens cannot occur
  * (split() never yields them) but are treated as gram breaks defensively.
  *
  * Why native: the HOF shape (array_sort over all grams + a struct fold)
  * is an O(n log n) interpreted-lambda sort per row and benched as the
  * engine's slowest text query at sf0.1 (16.4 s, 8× the next text
  * battery); this is one hash-counting walk inside whole-stage codegen —
  * scan-speed, zero shuffle, the shape that survives 100 TB. */
case class TopBigramExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"top_bigram needs array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("cnt", LongType, nullable = false),
    StructField("gram", StringType, nullable = false)))
  override def prettyName: String = "top_bigram"

  override def nullSafeEval(input: Any): Any =
    TopBigramExpr.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.TopBigramExpr.compute($arr);")

  override protected def withNewChildInternal(newChild: Expression): TopBigramExpr =
    copy(child = newChild)
}

object TopBigramExpr {

  private val Space = UTF8String.fromString(" ")
  private val Empty = UTF8String.fromString("")

  def compute(toks: ArrayData): InternalRow = {
    val n = toks.numElements()
    var bestCnt = 0L
    var bestGram = Empty
    if (n >= 2) {
      val counts = new java.util.HashMap[UTF8String, Integer](n * 2)
      var prev: UTF8String = if (toks.isNullAt(0)) null else toks.getUTF8String(0)
      var i = 1
      while (i < n) {
        val cur = if (toks.isNullAt(i)) null else toks.getUTF8String(i)
        if (prev != null && cur != null) {
          val gram = UTF8String.concat(prev, Space, cur)
          val c = counts.merge(gram, 1, (a, b) => a + b).longValue()
          // strict > keeps the FIRST gram to reach a count; the <0 arm
          // then lets a smaller gram take an EQUAL count — net effect is
          // (count DESC, gram ASC), the oracle's stated order
          if (c > bestCnt || (c == bestCnt && gram.compareTo(bestGram) < 0)) {
            bestCnt = c
            bestGram = gram
          }
          i += 1
        } else {
          i += 1
        }
        prev = cur
      }
    }
    new GenericInternalRow(Array[Any](bestCnt, bestGram))
  }

  def topBigram(tokens: Column): Column =
    ColumnBridge.column(TopBigramExpr(ColumnBridge.expression(tokens)))
}
