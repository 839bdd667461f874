package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native text normalization for fingerprinting: trim + lowercase + collapse
  * whitespace runs to one space — bit-identical to the HOF reference shape
  * `regexp_replace(lower(trim(text)), "\\s+", " ")`
  * ([[graft.llm.TextAnalysis.normalizeHof]], pinned by NormalizeTextExprSpec).
  *
  * Exactness argument for the byte-level pass: Java regex `\s` without
  * UNICODE_CHARACTER_CLASS matches exactly { space, \t, \n, \x0B, \f, \r } —
  * six ASCII code points, which in UTF-8 only ever appear as standalone
  * bytes < 0x80 — so collapsing those byte runs after UTF8String's own
  * trim/toLowerCase reproduces the regex replacement byte-for-byte.
  *
  * Why native: normalization runs once per document on the exact-dedup scan
  * path (every document, full corpus), and regexp_replace pays a regex
  * engine walk + rewrite per row.
  */
case class NormalizeTextExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"normalize_text needs string, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_text"

  override def nullSafeEval(input: Any): Any =
    NormalizeTextExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.NormalizeTextExpr.compute($s);")

  override protected def withNewChildInternal(newChild: Expression): NormalizeTextExpr =
    copy(child = newChild)
}

object NormalizeTextExpr {

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  /** Shared by eval and generated code. */
  def compute(input: UTF8String): UTF8String = {
    val lowered = input.trim().toLowerCase()
    val bytes = lowered.getBytes
    val n = bytes.length
    val out = new Array[Byte](n)
    var o = 0
    var i = 0
    var inRun = false
    var changed = false // same-length output can still differ ("\t" -> " ")
    while (i < n) {
      val b = bytes(i)
      if (isWs(b)) {
        if (!inRun) {
          out(o) = ' '; o += 1; inRun = true
          if (b != ' ') changed = true
        } else changed = true
      } else {
        out(o) = b; o += 1; inRun = false
      }
      i += 1
    }
    if (!changed) lowered
    else UTF8String.fromBytes(java.util.Arrays.copyOf(out, o))
  }

  def normalize(text: Column): Column =
    ColumnBridge.column(NormalizeTextExpr(ColumnBridge.expression(text)))
}
