package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native conditional-trigram-LM negative log-likelihood for
  * [[graft.llm.LmScore]]: total integer NLL of the padded input in ONE pass
  * — each code-point window pays its literal cost, unseen windows pay the
  * smoothing floor.
  *
  * Why native: the perplexity filter runs at corpus-scan scale (every
  * document, every curation pass); the HOF twin pays an interpreted lambda
  * plus an O(|profile|) literal-map probe per window. Bit-identical to
  * [[graft.llm.LmScore.nllHof]] (pinned by LmScoreSpec).
  *
  * Windows walk code points, matching Spark substr/length, the HOF twin,
  * and the DuckDB oracle — the [[LangIdScoresExpr]] contract. */
case class LmNllExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lm_nll needs string, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "lm_nll"

  override def nullSafeEval(input: Any): Any =
    LmNllExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.LmNllExpr.compute($s);")

  override protected def withNewChildInternal(newChild: Expression): LmNllExpr =
    copy(child = newChild)
}

object LmNllExpr {

  private lazy val costs: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long]()
    graft.llm.LmScore.costs.foreach { case (t, w) => m.put(t, w) }
    m
  }

  private lazy val unseen: Long = graft.llm.LmScore.UnseenCost

  /** Shared by eval and generated code. */
  def compute(padded: UTF8String): Long = {
    val cps = padded.toString.codePoints().toArray
    var nll = 0L
    var i = 0
    val last = cps.length - 3
    while (i <= last) {
      val w = costs.get(new String(cps, i, 3))
      nll += (if (w == null) unseen else w.longValue())
      i += 1
    }
    nll
  }

  def nll(padded: Column): Column =
    ColumnBridge.column(LmNllExpr(ColumnBridge.expression(padded)))
}
