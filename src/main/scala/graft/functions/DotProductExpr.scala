package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native dot product of two array<double> vectors — the codegen'd twin of
  * [[graft.llm.Similarity.dotHof]]'s `aggregate(zip_with(a, b, x·y), 0, +)`
  * fold. The generated loop accumulates `0.0 + a₁b₁ + a₂b₂ + …` in
  * ascending index order — the EXACT fp-op sequence of the HOF it
  * replaces (pinned equal by DotProductExprSpec), so every oracle that
  * restates the left-fold dot (SemDeDup's pair threshold, the normalize
  * step's squared norm) is unchanged bit for bit.
  *
  * Why native: the HOF pays interpreted lambda dispatch per element; on
  * SemDeDup's within-cell pair stage that's the hot op × |pairs| × dim.
  * Mismatched lengths or a null element yield NULL, mirroring the HOF
  * shape where zip_with pads with null and poisons the fold. */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"dot_product needs two array<double>, got $other")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val va = a.asInstanceOf[ArrayData]
    val vb = b.asInstanceOf[ArrayData]
    if (va.numElements() != vb.numElements()) null
    else {
      var dot = 0.0
      val n = va.numElements()
      var i = 0
      while (i < n) {
        if (va.isNullAt(i) || vb.isNullAt(i)) return null
        dot += va.getDouble(i) * vb.getDouble(i)
        i += 1
      }
      dot
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (va, vb) => {
      val dot = ctx.freshName("dot")
      val i = ctx.freshName("i")
      s"""
         |if ($va.numElements() != $vb.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $va.numElements(); $i++) {
         |    if ($va.isNullAt($i) || $vb.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $dot += $va.getDouble($i) * $vb.getDouble($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $dot; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotProductExpr = copy(left = newLeft, right = newRight)
}

object DotProductExpr {
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProductExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
