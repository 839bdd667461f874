package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native random-hyperplane LSH bucket: bit j = sign of ⟨vec, h_j⟩ with the
  * deterministic closed-form weights h_j[d] = sin(j·997 + d).
  *
  * Codegen'd twin of [[graft.llm.Similarity.lshBucket]] — bit-identical
  * (same Math.sin weights, same d-ascending accumulation order per plane,
  * pinned by HyperplaneBucketExprSpec) but ONE generated pass over the
  * vector computing all nBits projections, instead of nBits interpreted
  * aggregate folds. */
case class HyperplaneBucketExpr(child: Expression, nBits: Int)
    extends UnaryExpression {

  // nBits = 0 is the degenerate single-bucket config (constant 0): LSH-top-k
  // then equals brute force exactly, which gives the bucket-join plumbing an
  // oracle-checkable path independent of float-sign sensitivity
  require(nBits >= 0 && nBits <= 64, "nBits must be in [0, 64]")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_bucket needs array<double>, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_bucket"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val proj = new Array[Double](nBits)
    val n = arr.numElements()
    var d = 0
    while (d < n) {
      // a null element nulls every plane's fold in the HOF shape, so every
      // `proj >= 0` is null and every bit falls to the otherwise(0) arm —
      // bucket 0. Mirror that instead of reading garbage.
      if (arr.isNullAt(d)) return 0L
      val x = arr.getDouble(d)
      var j = 0
      while (j < nBits) {
        proj(j) += x * math.sin((j * 997 + d).toDouble)
        j += 1
      }
      d += 1
    }
    var out = 0L
    var j = 0
    while (j < nBits) {
      if (proj(j) >= 0) out |= (1L << j)
      j += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val proj = ctx.freshName("proj")
      val d = ctx.freshName("d")
      val j = ctx.freshName("j")
      val x = ctx.freshName("x")
      val out = ctx.freshName("out")
      s"""
         |double[] $proj = new double[$nBits];
         |boolean ${out}_nulled = false;
         |for (int $d = 0; $d < $arr.numElements(); $d++) {
         |  if ($arr.isNullAt($d)) { ${out}_nulled = true; break; }
         |  double $x = $arr.getDouble($d);
         |  for (int $j = 0; $j < $nBits; $j++) {
         |    $proj[$j] += $x * java.lang.Math.sin((double) ($j * 997 + $d));
         |  }
         |}
         |long $out = 0L;
         |if (!${out}_nulled) {
         |  for (int $j = 0; $j < $nBits; $j++) {
         |    if ($proj[$j] >= 0) $out |= (1L << $j);
         |  }
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucketExpr =
    copy(child = newChild)
}

object HyperplaneBucketExpr {
  def bucket(vec: Column, nBits: Int): Column =
    ColumnBridge.column(HyperplaneBucketExpr(ColumnBridge.expression(vec), nBits))
}
