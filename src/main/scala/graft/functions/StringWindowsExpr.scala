package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All `w`-code-point sliding windows of a string, as an array — the
  * n-gram-counting explode unit ([[graft.llm.LmTrain]]'s trigram/bigram
  * passes). Same window contract as [[LmNllExpr]]/[[LangIdScoresExpr]]:
  * code points, positions 1..len−w+1, empty below width — matching Spark
  * substr, the HOF twin shape, and the DuckDB oracle's substr walk.
  *
  * Why native: the HOF shape (`transform(sequence(...), i → substr)`)
  * pays an interpreted lambda + UTF8String substr per window; counting
  * passes explode EVERY window of EVERY document, so the per-window
  * constant is the whole cost. One generated-code pass builds the array
  * with a single code-point scan. */
case class StringWindowsExpr(child: Expression, w: Int)
    extends UnaryExpression {
  require(w >= 1, s"window width must be >= 1 (got $w)")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"string_windows needs string, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "string_windows"

  override def nullSafeEval(input: Any): Any =
    StringWindowsExpr.compute(input.asInstanceOf[UTF8String], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.StringWindowsExpr.compute($s, $w);")

  override protected def withNewChildInternal(newChild: Expression): StringWindowsExpr =
    copy(child = newChild)
}

object StringWindowsExpr {

  def compute(s: UTF8String, w: Int): GenericArrayData = {
    val cps = s.toString.codePoints().toArray
    val n = cps.length - w + 1
    if (n <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) = UTF8String.fromString(new String(cps, i, w))
      i += 1
    }
    new GenericArrayData(out)
  }

  def windows(text: Column, w: Int): Column =
    ColumnBridge.column(StringWindowsExpr(ColumnBridge.expression(text), w))
}
