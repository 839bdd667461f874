package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native cosine similarity of two array<double> vectors.
  *
  * Codegen'd twin of [[graft.llm.Similarity.cosine]] — one generated loop
  * accumulating dot product and both squared norms in ascending index order,
  * the exact fp-order of the HOF folds it replaces (pinned equal by
  * CosineSimilarityExprSpec), so candidate scores and oracle roundings are
  * unchanged. Mismatched lengths yield NULL, mirroring the HOF shape where
  * zip_with pads with null and poisons the fold. */
case class CosineSimilarityExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"cosine_similarity needs two array<double>, got $other")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_similarity"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val va = a.asInstanceOf[ArrayData]
    val vb = b.asInstanceOf[ArrayData]
    if (va.numElements() != vb.numElements()) null
    else {
      var dot = 0.0
      var na = 0.0
      var nb = 0.0
      val n = va.numElements()
      var i = 0
      while (i < n) {
        // a null element poisons the HOF fold to NULL — mirror it rather
        // than reading garbage off the unsafe array (embeddings decode from
        // parquet lists, which type as containsNull = true)
        if (va.isNullAt(i) || vb.isNullAt(i)) return null
        val x = va.getDouble(i)
        val y = vb.getDouble(i)
        dot += x * y
        na += x * x
        nb += y * y
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (va, vb) => {
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |if ($va.numElements() != $vb.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $va.numElements(); $i++) {
         |    if ($va.isNullAt($i) || $vb.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $x = $va.getDouble($i);
         |    double $y = $vb.getDouble($i);
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarityExpr =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarityExpr {
  def cosine(a: Column, b: Column): Column =
    ColumnBridge.column(
      CosineSimilarityExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
