package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Token-id sequence under a LEARNED BPE merge list — the id-emitting
  * sibling of [[LearnedBpeCountExpr]] and the last mile of the tokenizer
  * story: counts size a packing budget, but a trainer consumes id
  * SEQUENCES. Each non-empty token char-splits to code-point symbols, the
  * merges replay in rank order (the identical non-overlapping
  * left-to-right symbol apply — the two expressions share the walk
  * contract, pinned equal in BpeSpec), and every surviving symbol maps to
  * its vocabulary id.
  *
  * Id contract (engine-portable, restated verbatim by the DuckDB oracle):
  * vocab(i) holds id i — the caller passes the corpus' sorted distinct
  * base code points followed by the merge outputs in rank order
  * ([[graft.llm.Bpe.idVocab]]); when two merge outputs collide on the
  * same string the FIRST (lowest) id wins (the oracle's min(id) GROUP BY);
  * a symbol outside the vocabulary maps to -1 (UNK — a char unseen at
  * train time). Empty tokens emit nothing (no content, no id — unlike the
  * count expression's empty-counts-1 floor, which sizes budgets, not
  * sequences).
  *
  * 100 TB shape: one generated-code pass per row, merge list and vocab map
  * are driver-side literal state ([[LmModelNllExpr]]'s contract), no
  * shuffle — tokenization happens at export-scan speed. */
case class LearnedBpeIdsExpr(child: Expression,
    merges: Seq[(String, String)], vocab: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"learned_bpe_ids needs array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "learned_bpe_ids"

  @transient private lazy val mergeArr: Array[(String, String)] = merges.toArray

  // first-wins: a later merge output colliding with an earlier symbol
  // string must not steal its id
  // java.lang.Long values so a missing key is a REAL null, not an unboxed 0
  @transient private lazy val idMap: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](vocab.size * 2)
    var i = 0
    vocab.foreach { s =>
      if (!m.containsKey(s)) m.put(s, java.lang.Long.valueOf(i.toLong))
      i += 1
    }
    m
  }

  override def nullSafeEval(input: Any): Any =
    LearnedBpeIdsExpr.compute(input.asInstanceOf[ArrayData], mergeArr, idMap)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // RAW scala.Tuple2[] cast — Janino rejects generic-ARRAY casts and the
    // stage fell back to interpreted mode (see LearnedBpeCountExpr.doGenCode)
    val refM = ctx.addReferenceObj("bpeMerges", mergeArr, "scala.Tuple2[]")
    val refV = ctx.addReferenceObj("bpeIdMap", idMap,
      "java.util.HashMap<String, java.lang.Long>")
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.LearnedBpeIdsExpr.compute($arr, $refM, $refV);")
  }

  override protected def withNewChildInternal(newChild: Expression): LearnedBpeIdsExpr =
    copy(child = newChild)
}

object LearnedBpeIdsExpr {

  def compute(toks: ArrayData, merges: Array[(String, String)],
      ids: java.util.HashMap[String, java.lang.Long]): ArrayData = {
    val n = toks.numElements()
    val out = new scala.collection.mutable.ArrayBuffer[Long](n * 8)
    var i = 0
    while (i < n) {
      val tok = if (toks.isNullAt(i)) "" else toks.getUTF8String(i).toString
      if (tok.nonEmpty) {
        // the identical symbol walk as LearnedBpeCountExpr.compute — code
        // POINTS, merges replayed in rank order, non-overlapping
        val cps = tok.codePoints().toArray
        var syms = new Array[String](cps.length)
        var k = 0
        while (k < cps.length) {
          syms(k) = new String(Character.toChars(cps(k))); k += 1
        }
        var len = syms.length
        var m = 0
        while (m < merges.length) {
          val l = merges(m)._1
          val r = merges(m)._2
          val nxt = new Array[String](len)
          var w = 0
          var j = 0
          while (j < len) {
            if (j + 1 < len && syms(j) == l && syms(j + 1) == r) {
              nxt(w) = l + r; w += 1; j += 2
            } else { nxt(w) = syms(j); w += 1; j += 1 }
          }
          syms = nxt
          len = w
          m += 1
        }
        var s = 0
        while (s < len) {
          val id = ids.get(syms(s))
          out += (if (id == null) -1L else id.longValue())
          s += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  def ids(tokens: Column, merges: Seq[(String, String)],
      vocab: Seq[String]): Column =
    ColumnBridge.column(
      LearnedBpeIdsExpr(ColumnBridge.expression(tokens), merges, vocab))
}
