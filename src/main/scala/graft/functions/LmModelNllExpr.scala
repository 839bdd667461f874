package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** [[LmNllExpr]] for a RUNTIME-trained trigram cost model
  * ([[graft.llm.LmTrain]]): the model rides the expression as driver-side
  * state (bounded by LmTrain.TopM — the KenLM-pruning cap that makes it
  * O(1) at any corpus size) and each executor probes a rebuilt HashMap at
  * O(1) per window.
  *
  * Why this exists: the plan-only alternative — a map column from
  * map_from_entries cross-joined onto every row — probes with
  * `element_at`, which on Spark's ArrayBasedMapData is a LINEAR scan of
  * all TopM entries per window; at 4096 entries × ~300 windows/doc it
  * benched 22.6 s at sf0.1 where this pass runs in well under a second.
  * Same window contract as [[LmNllExpr]]: code points, width 3, unseen
  * pays the floor. */
case class LmModelNllExpr(child: Expression, model: Map[String, Long],
    unseen: Long) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lm_model_nll needs string, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "lm_model_nll"

  @transient private lazy val jmap: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](model.size * 2)
    model.foreach { case (t, w) => m.put(t, w) }
    m
  }

  override def nullSafeEval(input: Any): Any =
    LmModelNllExpr.compute(input.asInstanceOf[UTF8String], jmap, unseen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mapRef = ctx.addReferenceObj("lmModel", jmap,
      "java.util.HashMap<String, Long>")
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.LmModelNllExpr.compute($s, $mapRef, ${unseen}L);")
  }

  override protected def withNewChildInternal(newChild: Expression): LmModelNllExpr =
    copy(child = newChild)
}

object LmModelNllExpr {

  /** Shared by eval and generated code. */
  def compute(padded: UTF8String,
      model: java.util.HashMap[String, java.lang.Long], unseen: Long): Long = {
    val cps = padded.toString.codePoints().toArray
    var nll = 0L
    var i = 0
    val last = cps.length - 3
    while (i <= last) {
      val w = model.get(new String(cps, i, 3))
      nll += (if (w == null) unseen else w.longValue())
      i += 1
    }
    nll
  }

  def nll(padded: Column, model: Map[String, Long], unseen: Long): Column =
    ColumnBridge.column(
      LmModelNllExpr(ColumnBridge.expression(padded), model, unseen))
}
