package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.MapData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native F15 labels key: the deterministic "k1=v1,k2=v2" rendering of a
  * map<string,string> with entries sorted by their rendered "k=v" string
  * (reference: pkg/promread/handler.go:341-347 — the reference iterates a Go
  * map and we sort for determinism, per SURVEY §2.2 F15).
  *
  * Bit-identical to the HOF reference shape in
  * [[graft.query.Promread.labelsKeyHof]]
  * (`array_join(array_sort(transform(map_entries(m), k=v)), ",")`), pinned by
  * LabelsKeyExprSpec. Note the sort compares the WHOLE rendered entry (the
  * HOF's array_sort of strings), not the key alone — the two differ when one
  * key is a prefix of another key followed by a byte below '=' (0x3D); the
  * comparator here is UTF8String's unsigned byte order, exactly Spark's own
  * string ordering and DuckDB's default binary collation.
  *
  * Why native: the HOF chain evaluates four interpreted collection ops per
  * row on the read path's every output row (and in the attribute-merge
  * fixture it was the bench's dominant per-row cost). One helper call per row
  * from generated code replaces the interpreted lambda machinery.
  */
case class LabelsKeyExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case MapType(StringType, StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"labels_key needs map<string,string>, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "labels_key"

  override def nullSafeEval(input: Any): Any =
    LabelsKeyExpr.compute(input.asInstanceOf[MapData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, m =>
      s"${ev.value} = graft.functions.LabelsKeyExpr.compute($m);")

  override protected def withNewChildInternal(newChild: Expression): LabelsKeyExpr =
    copy(child = newChild)
}

object LabelsKeyExpr {

  private val Eq = UTF8String.fromString("=")
  private val Comma = UTF8String.fromString(",")

  /** Shared by eval and generated code (JIT-compiles once; string work gains
    * nothing from being inlined into the generated class). */
  def compute(m: MapData): UTF8String = {
    val n = m.numElements()
    val keys = m.keyArray()
    val values = m.valueArray()
    val rendered = new Array[UTF8String](n)
    var out = 0
    var i = 0
    while (i < n) {
      // a null value nulls the HOF's concat, and array_join then drops the
      // element — so a null-valued entry vanishes from the key; mirrored here
      if (!values.isNullAt(i)) {
        rendered(out) = UTF8String.concat(keys.getUTF8String(i), Eq,
          values.getUTF8String(i))
        out += 1
      }
      i += 1
    }
    val kept = if (out == n) rendered else java.util.Arrays.copyOf(rendered, out)
    java.util.Arrays.sort(kept.asInstanceOf[Array[AnyRef]])
    UTF8String.concatWs(Comma, kept: _*)
  }

  def labelsKey(attributes: Column): Column =
    ColumnBridge.column(LabelsKeyExpr(ColumnBridge.expression(attributes)))
}
