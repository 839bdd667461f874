package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Count of positions where two long arrays hold equal values — the MinHash
  * signature-agreement kernel behind est_jaccard (agreement/k estimates the
  * Jaccard similarity; Broder's classic result).
  *
  * Bit-identical to the HOF reference shape
  * `size(filter(zip_with(a, b, _ === _), identity))` on equal-length
  * null-free signatures (the only shape MinHash produces — signatures are
  * fixed k-wide projections); positions beyond the shorter array, or with a
  * null on either side, never compare equal, matching the HOF where zip_with
  * pads with null and `===` yields null (filter drops it). Pinned by
  * ArrayEqCountExprSpec.
  *
  * Why native: evaluated once per CANDIDATE PAIR after the band join — at
  * corpus scale the candidate stream is the dedup pipeline's widest
  * intermediate, and the HOF form is ~3·k interpreted lambda evaluations per
  * pair. Here it is a k-step primitive loop, inside whole-stage codegen.
  */
case class ArrayEqCountExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  private def isLongArray(t: DataType): Boolean = t match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isLongArray(left.dataType) && isLongArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"array_eq_count needs two array<bigint>, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "array_eq_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var eq = 0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i) && x.getLong(i) == y.getLong(i)) eq += 1
      i += 1
    }
    eq
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      s"""
         |${ev.value} = 0; // nullSafeCodeGen pre-initializes to the type default (-1)
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i) &&
         |      $a.getLong($i) == $b.getLong($i)) ${ev.value}++;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayEqCountExpr =
    copy(left = newLeft, right = newRight)
}

object ArrayEqCountExpr {
  def eqCount(a: Column, b: Column): Column =
    ColumnBridge.column(ArrayEqCountExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
