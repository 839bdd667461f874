package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native integer squared-L2 distance of two array<long> vectors — the
  * codegen'd twin of [[graft.llm.Similarity.l2sqHof]]'s
  * `aggregate(zip_with(a, b, (x−y)²), 0L, +)` fold, accumulating in
  * ascending index order (integer arithmetic — associativity is exact, but
  * the fold order is kept identical anyway; pinned equal by L2SqExprSpec).
  *
  * Why native: the HOF pays interpreted lambda dispatch per element, and
  * the centroid-assignment stages evaluate this N·k times (SemDeDup cell
  * assignment, IVF/IVF-PQ coarse quantizers, k-means iterations) — the
  * r18-measured superlinear term of q_dedup_semdedup's 10× ratio was
  * exactly this op across the assignment crossJoin. Mismatched lengths or
  * a null element yield NULL, mirroring the HOF shape where zip_with pads
  * with null and poisons the fold. */
case class L2SqExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"l2sq needs two array<bigint>, got $other")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "l2sq"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val va = a.asInstanceOf[ArrayData]
    val vb = b.asInstanceOf[ArrayData]
    if (va.numElements() != vb.numElements()) null
    else {
      var acc = 0L
      val n = va.numElements()
      var i = 0
      while (i < n) {
        if (va.isNullAt(i) || vb.isNullAt(i)) return null
        val d = va.getLong(i) - vb.getLong(i)
        acc += d * d
        i += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (va, vb) => {
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      s"""
         |if ($va.numElements() != $vb.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $va.numElements(); $i++) {
         |    if ($va.isNullAt($i) || $vb.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    long $d = $va.getLong($i) - $vb.getLong($i);
         |    $acc += $d * $d;
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): L2SqExpr = copy(left = newLeft, right = newRight)
}

object L2SqExpr {
  def l2sq(a: Column, b: Column): Column =
    ColumnBridge.column(
      L2SqExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
