package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, MapType, StringType}

/** Native S5 attribute merge — datapoint wins on key collision
  * (reference: internal/receiver/otlp.go:332-344).
  *
  * Bit-identical to the HOF reference shape
  * ([[graft.ingest.OtlpFlatten.mergeAttributesHof]]): resource entries whose
  * key the datapoint also carries are dropped, survivors keep resource order,
  * datapoint entries follow in their order — exactly
  * `map_from_entries(concat(filter(resource_entries, !contains), dp_entries))`.
  * Pinned by MergeAttributesExprSpec.
  *
  * Why native: the merge runs once per ingested datapoint — the engine's
  * full-scan write path — and the HOF `filter` with a `map_contains_key`
  * probe per entry is interpreted, which also breaks whole-stage codegen for
  * the entire ingest projection. Attribute maps are small (a handful of
  * keys), so the O(r·d) probe loop is trivial once compiled.
  */
case class MergeAttributesExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  private def isStringMap(t: DataType): Boolean = t match {
    case MapType(StringType, StringType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isStringMap(left.dataType) && isStringMap(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"merge_attributes needs two map<string,string>, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")

  // values can come from EITHER side, so nullability is the union
  override def dataType: DataType = (left.dataType, right.dataType) match {
    case (MapType(_, _, ln), MapType(_, _, rn)) =>
      MapType(StringType, StringType, ln || rn)
    case _ => right.dataType
  }
  override def prettyName: String = "merge_attributes"

  override def nullSafeEval(resource: Any, dp: Any): Any =
    MergeAttributesExpr.compute(
      resource.asInstanceOf[MapData], dp.asInstanceOf[MapData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (r, d) =>
      s"${ev.value} = graft.functions.MergeAttributesExpr.compute($r, $d);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MergeAttributesExpr =
    copy(left = newLeft, right = newRight)
}

object MergeAttributesExpr {

  /** Shared by eval and generated code. */
  def compute(resource: MapData, dp: MapData): MapData = {
    val rn = resource.numElements()
    val dn = dp.numElements()
    val rKeys = resource.keyArray()
    val rVals = resource.valueArray()
    val dKeys = dp.keyArray()
    val dVals = dp.valueArray()
    val keys = new Array[Any](rn + dn)
    val vals = new Array[Any](rn + dn)
    var out = 0
    var i = 0
    while (i < rn) {
      val k = rKeys.getUTF8String(i)
      var shadowed = false
      var j = 0
      while (!shadowed && j < dn) {
        if (dKeys.getUTF8String(j) == k) shadowed = true
        j += 1
      }
      if (!shadowed) {
        keys(out) = k
        vals(out) = if (rVals.isNullAt(i)) null else rVals.getUTF8String(i)
        out += 1
      }
      i += 1
    }
    i = 0
    while (i < dn) {
      keys(out) = dKeys.getUTF8String(i)
      vals(out) = if (dVals.isNullAt(i)) null else dVals.getUTF8String(i)
      out += 1
      i += 1
    }
    val k = if (out == keys.length) keys
      else java.util.Arrays.copyOf(keys.asInstanceOf[Array[AnyRef]], out)
    val v = if (out == vals.length) vals
      else java.util.Arrays.copyOf(vals.asInstanceOf[Array[AnyRef]], out)
    new ArrayBasedMapData(new GenericArrayData(k), new GenericArrayData(v))
  }

  def merge(resourceAttrs: Column, dpAttrs: Column): Column =
    ColumnBridge.column(MergeAttributesExpr(
      ColumnBridge.expression(resourceAttrs), ColumnBridge.expression(dpAttrs)))
}
