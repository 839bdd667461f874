package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

import graft.histo.HistogramMath
import graft.model.{Bucket, ExpBucket}

/** Native expressions for the histogram scalar functions (A7/A8/A10/A11) —
  * thin Catalyst bindings over the pure math in
  * [[graft.histo.HistogramMath]], replacing the Scala-UDF bindings kept in
  * [[graft.histo.HistogramFunctions]] as the reference shapes.
  *
  * Identical outputs by construction (both call the same pure functions;
  * pinned by HistogramExprsSpec): the difference is the binding layer — a
  * UDF pays the Catalyst↔Scala Row conversion and an opaque-function
  * codegen boundary per call, an Expression converts ArrayData directly and
  * stays inside whole-stage codegen. Errors (p out of range, empty/zero
  * histogram) surface as NULL, exactly like the UDF `.toOption` binding of
  * the reference's `(0, error)` returns (pkg/histogram/percentile.go:17-37).
  */
object HistogramExprs {

  private[functions] val BucketArray =
    ArrayType(StructType(Seq(
      StructField("le", DoubleType), StructField("count", LongType))))
  private[functions] val ExpBucketArray =
    ArrayType(StructType(Seq(
      StructField("index", IntegerType), StructField("count", LongType))))

  private[functions] def bucketArrayMatches(t: DataType): Boolean =
    matches(t, BucketArray)

  private def matches(t: DataType, want: ArrayType): Boolean = t match {
    case ArrayType(s: StructType, _) =>
      val w = want.elementType.asInstanceOf[StructType]
      s.fields.length == w.fields.length &&
        s.fields.zip(w.fields).forall { case (a, b) => a.dataType == b.dataType }
    case _ => false
  }

  private[functions] def toBuckets(arr: ArrayData): Seq[Bucket] = {
    val n = arr.numElements()
    val out = Vector.newBuilder[Bucket]
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val r = arr.getStruct(i, 2)
        out += Bucket(r.getDouble(0), r.getLong(1))
      }
      i += 1
    }
    out.result()
  }

  private[functions] def toExpBuckets(arr: ArrayData): Seq[ExpBucket] = {
    if (arr == null) return Nil
    val n = arr.numElements()
    val out = Vector.newBuilder[ExpBucket]
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val r = arr.getStruct(i, 2)
        out += ExpBucket(r.getInt(0), r.getLong(1))
      }
      i += 1
    }
    out.result()
  }

  private[functions] def fromBuckets(bs: Seq[Bucket]): GenericArrayData =
    new GenericArrayData(bs.map(b =>
      new GenericInternalRow(Array[Any](b.le, b.count)): InternalRow).toArray[Any])

  /** A7 — interpolated percentile over explicit-bound delta buckets. */
  case class HistogramQuantileExpr(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def checkInputDataTypes(): TypeCheckResult =
      if (matches(left.dataType, BucketArray) && right.dataType == DoubleType)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"histogram_quantile needs (array<struct<le,count>>, double), got " +
          s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "histogram_quantile"
    override def nullSafeEval(b: Any, p: Any): Any =
      HistogramMath.percentile(toBuckets(b.asInstanceOf[ArrayData]),
        p.asInstanceOf[Double]).toOption.map(java.lang.Double.valueOf).orNull
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
  }

  /** A8 — multi-percentile, one pass; NULL on error (any bad p). */
  case class HistogramQuantilesExpr(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def checkInputDataTypes(): TypeCheckResult =
      if (matches(left.dataType, BucketArray) &&
        right.dataType.isInstanceOf[ArrayType] &&
        right.dataType.asInstanceOf[ArrayType].elementType == DoubleType)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure("histogram_quantiles needs " +
        s"(array<struct<le,count>>, array<double>), got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "histogram_quantiles"
    override def nullSafeEval(b: Any, ps: Any): Any = {
      val arr = ps.asInstanceOf[ArrayData]
      // a null percentile entry is an error, like any out-of-range p — NULL
      // result, never a silent 0.0 read off the unsafe array
      if ((0 until arr.numElements()).exists(arr.isNullAt)) return null
      val psSeq = (0 until arr.numElements()).map(arr.getDouble(_))
      HistogramMath.percentiles(toBuckets(b.asInstanceOf[ArrayData]), psSeq)
        .toOption.map(vs => new GenericArrayData(vs.toArray[Any])).orNull
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
  }

  /** A10 — delta→cumulative prefix sum over one bucket vector. */
  case class BucketsToCumulativeExpr(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def checkInputDataTypes(): TypeCheckResult =
      if (matches(child.dataType, BucketArray)) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"buckets_to_cumulative needs array<struct<le,count>>, got " +
          child.dataType.simpleString)
    override def dataType: DataType = BucketArray
    override def prettyName: String = "buckets_to_cumulative"
    override def nullSafeEval(b: Any): Any =
      fromBuckets(HistogramMath.deltaToCumulative(toBuckets(b.asInstanceOf[ArrayData])))
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  /** A10 — cumulative→delta adjacent difference. */
  case class BucketsToDeltaExpr(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def checkInputDataTypes(): TypeCheckResult =
      if (matches(child.dataType, BucketArray)) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"buckets_to_delta needs array<struct<le,count>>, got " +
          child.dataType.simpleString)
    override def dataType: DataType = BucketArray
    override def prettyName: String = "buckets_to_delta"
    override def nullSafeEval(b: Any): Any =
      fromBuckets(HistogramMath.cumulativeToDelta(toBuckets(b.asInstanceOf[ArrayData])))
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  /** A11 — exponential-histogram percentile (negative walk included).
    * Null pos/neg arrays are treated as empty (the UDF's `rows == null`
    * arm), so the expression must NOT null-short-circuit on them. */
  case class ExpQuantileExpr(children: Seq[Expression])
      extends Expression with CodegenFallback {
    require(children.length == 5,
      "exp_histogram_quantile(scale, zeroCount, pos, neg, p)")
    private def Seq5(i: Int) = children(i)
    override def checkInputDataTypes(): TypeCheckResult =
      if (Seq5(0).dataType == IntegerType && Seq5(1).dataType == LongType &&
        (matches(Seq5(2).dataType, ExpBucketArray) || Seq5(2).dataType == NullType) &&
        (matches(Seq5(3).dataType, ExpBucketArray) || Seq5(3).dataType == NullType) &&
        Seq5(4).dataType == DoubleType)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        "exp_histogram_quantile needs (int, bigint, array<struct<index,count>>, " +
          "array<struct<index,count>>, double); got " +
          children.map(_.dataType.simpleString).mkString(", "))
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def foldable: Boolean = children.forall(_.foldable)
    override def eval(input: InternalRow): Any = {
      val scale = Seq5(0).eval(input)
      val zc = Seq5(1).eval(input)
      val p = Seq5(4).eval(input)
      if (scale == null || zc == null || p == null) return null
      val pos = Seq5(2).eval(input).asInstanceOf[ArrayData]
      val neg = Seq5(3).eval(input).asInstanceOf[ArrayData]
      HistogramMath.expPercentile(
        scale.asInstanceOf[Int], zc.asInstanceOf[Long],
        toExpBuckets(pos), toExpBuckets(neg), p.asInstanceOf[Double])
        .toOption.map(java.lang.Double.valueOf).orNull
    }
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]) = copy(children = newChildren)
  }

  // All five bind via CodegenFallback: they run once per GROUP
  // post-aggregation — row volume is tiny — so the win over a UDF is
  // dropping the Catalyst↔Scala Row conversion layer, not loop codegen.

  def histogram_quantile(buckets: Column, p: Column): Column =
    ColumnBridge.column(HistogramQuantileExpr(
      ColumnBridge.expression(buckets), ColumnBridge.expression(p)))

  def histogram_quantiles(buckets: Column, ps: Column): Column =
    ColumnBridge.column(HistogramQuantilesExpr(
      ColumnBridge.expression(buckets), ColumnBridge.expression(ps)))

  def buckets_to_cumulative(buckets: Column): Column =
    ColumnBridge.column(BucketsToCumulativeExpr(ColumnBridge.expression(buckets)))

  def buckets_to_delta(buckets: Column): Column =
    ColumnBridge.column(BucketsToDeltaExpr(ColumnBridge.expression(buckets)))

  def exp_histogram_quantile(scale: Column, zeroCount: Column, pos: Column,
      neg: Column, p: Column): Column =
    ColumnBridge.column(ExpQuantileExpr(Seq(scale, zeroCount, pos, neg, p)
      .map(ColumnBridge.expression)))
}
