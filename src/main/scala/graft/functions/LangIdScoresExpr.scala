package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native char-trigram Naive-Bayes scoring for [[graft.llm.LangId]]:
  * `array<bigint>` of per-language integer scores (in LangId.Langs order)
  * from ONE pass over the padded input string.
  *
  * Why native: langid runs at corpus-scan scale and the HOF twin pays an
  * interpreted lambda per trigram PER LANGUAGE with O(|profile|) literal-map
  * probes per lookup. Here the per-language profiles are pre-merged into one
  * hash map (trigram → weight vector, absent languages already filled with
  * their smoothing default), so scoring is one O(1) probe per trigram for
  * ALL languages, inside whole-stage codegen. Bit-identical to
  * [[graft.llm.LangId.scoresHof]] (pinned by LangIdSpec).
  *
  * Trigram windows walk code points (matching Spark substr/length and the
  * oracle's substr — non-BMP characters occupy ONE window position). */
case class LangIdScoresExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"langid_scores needs string, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "langid_scores"

  override def nullSafeEval(input: Any): Any =
    LangIdScoresExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.LangIdScoresExpr.compute($s);")

  override protected def withNewChildInternal(newChild: Expression): LangIdScoresExpr =
    copy(child = newChild)
}

object LangIdScoresExpr {

  private lazy val langs: Array[String] = graft.llm.LangId.Langs.toArray

  /** trigram → boost vector over langs; a language missing the trigram
    * carries 0, so one probe answers every language. Boost scoring means
    * an UNMATCHED window contributes nothing anywhere — the hot loop skips
    * it entirely (most windows of most documents, at corpus-scan scale). */
  private lazy val merged: java.util.HashMap[String, Array[Long]] = {
    val m = new java.util.HashMap[String, Array[Long]]()
    val tris = graft.llm.LangId.profile.valuesIterator.flatMap(_.keys).toSet
    tris.foreach { t =>
      m.put(t, langs.indices.map(i =>
        graft.llm.LangId.profile(langs(i)).getOrElse(t, 0L)).toArray)
    }
    m
  }

  /** Shared by eval and generated code. Windows walk CODE POINTS, not
    * UTF-16 units — Spark's substr/length, the HOF twin, and the DuckDB
    * oracle all count code points, so a supplementary character (emoji)
    * must be ONE window position in all three. */
  def compute(padded: UTF8String): ArrayData = {
    val s = padded.toString
    val cps = s.codePoints().toArray
    val scores = new Array[Long](langs.length)
    var i = 0
    val last = cps.length - 3
    while (i <= last) {
      val w = merged.get(new String(cps, i, 3))
      if (w != null) {
        var j = 0
        while (j < scores.length) { scores(j) += w(j); j += 1 }
      }
      i += 1
    }
    new GenericArrayData(scores)
  }

  def scores(padded: Column): Column =
    ColumnBridge.column(LangIdScoresExpr(ColumnBridge.expression(padded)))
}
