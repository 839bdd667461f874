package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StructType}

/** Native J2 bucket alignment: delta per bucket = current count minus the
  * previous snapshot's count at the SAME bound (exact Float64 equality, as
  * the reference's Go map key — temporality.go:115-140); bounds absent from
  * the previous snapshot pass the raw count through; duplicate bounds in the
  * previous snapshot resolve last-wins (Go map insert order).
  *
  * Bit-identical to the HOF reference shape
  * ([[graft.metrics.Temporality.deltaBucketsHof]]) — pinned by
  * BucketDeltaExprSpec. The null-prev / reset passthrough arms stay OUTSIDE
  * in the caller's `when`, so this expression only computes the pure
  * two-array delta.
  *
  * Why native: unlike the per-group quantile UDFs, bucket alignment runs per
  * histogram DATA POINT — full-scan row volume. The HOF form nests
  * `transform(buckets, filter(prevBuckets, …))`, i.e. O(bounds²) interpreted
  * lambda-tree evaluations per row; here it is the same O(n·m) loop over
  * primitive doubles/longs, compiled once.
  */
case class BucketDeltaExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  private def isBucketArray(t: DataType): Boolean = t match {
    case ArrayType(s: StructType, _) =>
      s.fields.length == 2 &&
        s.fields(0).dataType == DoubleType && s.fields(1).dataType == LongType
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isBucketArray(left.dataType) && isBucketArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bucket_delta needs two array<struct<le:double,count:bigint>>, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")

  override def dataType: DataType = left.dataType
  override def prettyName: String = "bucket_delta"

  override def nullSafeEval(buckets: Any, prev: Any): Any =
    BucketDeltaExpr.compute(
      buckets.asInstanceOf[ArrayData], prev.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, p) =>
      s"${ev.value} = graft.functions.BucketDeltaExpr.compute($b, $p);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BucketDeltaExpr =
    copy(left = newLeft, right = newRight)
}

object BucketDeltaExpr {

  /** Shared by eval and generated code.
    *
    * Null handling mirrors the HOF shape (never seen on the ingest path, but
    * the type check admits nullable elements/fields): a null CURRENT element
    * or null le/count projects through as nulls (`getField` on null → null,
    * null arithmetic → null); a null PREV element or null prev-le matches
    * nothing (`===` on null filters out); a matched prev with null count
    * coalesces to 0. */
  def compute(buckets: ArrayData, prev: ArrayData): GenericArrayData = {
    val n = buckets.numElements()
    val m = prev.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (buckets.isNullAt(i)) {
        out(i) = new GenericInternalRow(Array[Any](null, null)): InternalRow
      } else {
        val b = buckets.getStruct(i, 2)
        val leNull = b.isNullAt(0)
        val le = if (leNull) 0.0 else b.getDouble(0)
        var pc = 0L
        if (!leNull) {
          var j = 0
          while (j < m) {
            if (!prev.isNullAt(j)) {
              val p = prev.getStruct(j, 2)
              if (!p.isNullAt(0) && p.getDouble(0) == le) // last-wins on dups
                pc = if (p.isNullAt(1)) 0L else p.getLong(1)
            }
            j += 1
          }
        }
        val cnt: Any = if (b.isNullAt(1)) null else b.getLong(1) - pc
        out(i) = new GenericInternalRow(
          Array[Any](if (leNull) null else le, cnt)): InternalRow
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  def delta(buckets: Column, prevBuckets: Column): Column =
    ColumnBridge.column(BucketDeltaExpr(
      ColumnBridge.expression(buckets), ColumnBridge.expression(prevBuckets)))
}
