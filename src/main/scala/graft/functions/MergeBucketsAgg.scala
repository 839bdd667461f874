package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.DataType

/** A9 (bucket merge across rows) as ONE aggregate call —
  * `merge_buckets_agg(buckets)` — instead of the explode → groupBy(le) →
  * sum → collect_list rewrite ([[graft.histo.HistogramFunctions.mergeBuckets]],
  * which remains the compose-from-built-ins scale path when the merge IS the
  * query). Reference semantics: pkg/histogram/percentile.go:83-105 — sum
  * counts per upper bound, result sorted by bound.
  *
  * The single-call form exists for the dashboard shape
  * `groupBy(keys, bucket).agg(..., histogram_quantile(merge_buckets_agg(buckets), p))`
  * — one hash aggregation instead of two — and because a single
  * AggregateFunction node is what [[graft.plans.RollupRouting]] can match
  * and reroute onto a stored rollup tier's bucket concat (the tier stores
  * `flatten(collect_list(buckets))` per group — the same entry multiset —
  * so merging the stored concat is exactly merging the raw arrays).
  *
  * Buffer is a bound→count hash map; partial aggregation applies map-side,
  * merge is associative+commutative, and the result sorts by bound — so the
  * output is deterministic under any row order (unlike raw collect_list,
  * which is why the concat-then-merge equivalence needs the merge).
  */
case class MergeBucketsAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[Double, Long]]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (HistogramExprs.bucketArrayMatches(child.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"merge_buckets_agg needs array<struct<le,count>>, got " +
        child.dataType.simpleString)

  override def dataType: DataType = HistogramExprs.BucketArray
  override def nullable: Boolean = false
  override def prettyName: String = "merge_buckets_agg"

  override def createAggregationBuffer(): mutable.HashMap[Double, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[Double, Long],
      input: InternalRow): mutable.HashMap[Double, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val r = arr.getStruct(i, 2)
          val le = r.getDouble(0)
          buf.update(le, buf.getOrElse(le, 0L) + r.getLong(1))
        }
        i += 1
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[Double, Long],
      other: mutable.HashMap[Double, Long]): mutable.HashMap[Double, Long] = {
    other.foreach { case (le, c) =>
      buf.update(le, buf.getOrElse(le, 0L) + c)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[Double, Long]): Any =
    new GenericArrayData(buf.toSeq.sortBy(_._1).map { case (le, c) =>
      new GenericInternalRow(Array[Any](le, c)): InternalRow
    }.toArray[Any])

  override def serialize(buf: mutable.HashMap[Double, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (le, c) => out.writeDouble(le); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[Double, Long] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[Double, Long]
    var i = 0
    while (i < n) { buf.update(in.readDouble(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(off: Int): MergeBucketsAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): MergeBucketsAgg =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildInternal(newChild: Expression): MergeBucketsAgg =
    copy(child = newChild)
}

object MergeBucketsAgg {
  /** `df.groupBy(keys).agg(merge_buckets_agg($"buckets"))` column form. */
  def merge(buckets: Column): Column =
    ColumnBridge.column(
      MergeBucketsAgg(ColumnBridge.expression(buckets)).toAggregateExpression())
}
