package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native S3 +Inf bucket-bound synthesis: OTLP carries N explicit bounds and
  * N+1 counts; the last bucket's bound is +Inf
  * (reference: internal/receiver/otlp.go:216-221).
  *
  * Bit-identical to the HOF reference shape
  * ([[graft.ingest.OtlpFlatten.withInfBucketHof]]) —
  * `zip_with(concat(bounds, [+Inf]), counts, struct)` — including zip_with's
  * length semantics: the output has max(N+1, |counts|) entries and the
  * shorter side pads with NULL fields. Pinned by InfBucketExprSpec.
  *
  * Why native: runs once per ingested histogram datapoint (the full-scan
  * write path); the HOF zip_with is interpreted and breaks whole-stage
  * codegen for the ingest projection (the same argument as
  * [[MergeAttributesExpr]]).
  */
case class InfBucketExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"with_inf_bucket needs array<double> bounds and array<bigint> counts, " +
          s"got ${l.simpleString} / ${r.simpleString}")
    }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("le", DoubleType, nullable = true),
    StructField("count", LongType, nullable = true))), containsNull = false)
  override def prettyName: String = "with_inf_bucket"

  override def nullSafeEval(bounds: Any, counts: Any): Any =
    InfBucketExpr.compute(
      bounds.asInstanceOf[ArrayData], counts.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, c) =>
      s"${ev.value} = graft.functions.InfBucketExpr.compute($b, $c);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): InfBucketExpr =
    copy(left = newLeft, right = newRight)
}

object InfBucketExpr {

  /** Shared by eval and generated code. Mirrors zip_with: output length is
    * max of the two padded inputs, missing side yields null fields. */
  def compute(bounds: ArrayData, counts: ArrayData): GenericArrayData = {
    val nb = bounds.numElements() + 1 // + the synthesized +Inf bound
    val nc = counts.numElements()
    val n = math.max(nb, nc)
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val le: Any =
        if (i < nb - 1) {
          if (bounds.isNullAt(i)) null else java.lang.Double.valueOf(bounds.getDouble(i))
        } else if (i == nb - 1) java.lang.Double.valueOf(Double.PositiveInfinity)
        else null
      val c: Any =
        if (i < nc) { if (counts.isNullAt(i)) null else java.lang.Long.valueOf(counts.getLong(i)) }
        else null
      out(i) = new GenericInternalRow(Array[Any](le, c)): InternalRow
      i += 1
    }
    new GenericArrayData(out)
  }

  def withInf(bounds: Column, counts: Column): Column =
    ColumnBridge.column(InfBucketExpr(
      ColumnBridge.expression(bounds), ColumnBridge.expression(counts)))
}
