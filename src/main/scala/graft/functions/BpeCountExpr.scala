package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native pinned-vocab subword counting for [[graft.llm.Bpe]]: `bigint`
  * total of greedy longest-match segment counts over a token array, in one
  * pass inside whole-stage codegen.
  *
  * Why native: subword budgeting runs at corpus-scan scale in the packing
  * and corpus-stats paths, and greedy segmentation is a per-position
  * longest-match loop no HOF composition expresses without quadratic
  * re-slicing. Pinned element-wise equal to the Scala reference
  * ([[graft.llm.Bpe.countToken]]) by BpeSpec.
  *
  * Walks CODE POINTS (matching the oracle's substr/len and the LangId
  * window convention) — a supplementary character is one position. */
case class BpeCountExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_count needs array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "bpe_count"

  override def nullSafeEval(input: Any): Any =
    BpeCountExpr.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.BpeCountExpr.compute($arr);")

  override protected def withNewChildInternal(newChild: Expression): BpeCountExpr =
    copy(child = newChild)
}

object BpeCountExpr {

  /** Code-point trie over the vocab, flattened to primitive arrays: per
    * node a SORTED child-key array + parallel child-index array (probe =
    * one binarySearch, zero allocation) and a terminal flag. Greedy
    * longest-match is then ONE descent per position — the previous
    * HashSet probing allocated up to (MaxGram-MinGram+1) candidate-gram
    * Strings per code point on the corpus-scan hot path. */
  private final class Trie(
      childKeys: Array[Array[Int]],
      childIdx: Array[Array[Int]],
      terminal: Array[Boolean]) {
    /** Longest vocab gram starting at cps(i) with length in
      * [minG, maxLen]; 0 when none. */
    def longestMatch(cps: Array[Int], i: Int, maxLen: Int, minG: Int): Int = {
      var node = 0
      var depth = 0
      var best = 0
      while (depth < maxLen) {
        val ks = childKeys(node)
        val j = java.util.Arrays.binarySearch(ks, cps(i + depth))
        if (j < 0) return best
        node = childIdx(node)(j)
        depth += 1
        if (depth >= minG && terminal(node)) best = depth
      }
      best
    }
  }

  private lazy val trie: Trie = {
    val children = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.TreeMap.empty[Int, Int])
    val term = scala.collection.mutable.ArrayBuffer(false)
    // sorted insertion order → deterministic node layout (inspectability;
    // match results are order-independent regardless)
    graft.llm.Bpe.vocab.keys.toSeq.sorted.foreach { g =>
      var node = 0
      g.codePoints().toArray.foreach { cp =>
        node = children(node).getOrElseUpdate(cp, {
          children += scala.collection.mutable.TreeMap.empty[Int, Int]
          term += false
          children.size - 1
        })
      }
      term(node) = true
    }
    new Trie(
      children.map(_.keys.toArray).toArray,
      children.map(_.values.toArray).toArray,
      term.toArray)
  }

  /** Shared by eval and generated code: Σ per-token greedy counts, with a
    * null array element counting like an empty token (floor 1). */
  def compute(tokens: ArrayData): Long = {
    val minG = graft.llm.Bpe.MinGram
    val maxG = graft.llm.Bpe.MaxGram
    val tr = trie
    var total = 0L
    var t = 0
    val n = tokens.numElements()
    while (t < n) {
      val u = tokens.getUTF8String(t)
      val cps =
        if (u == null) Array.empty[Int] else u.toString.codePoints().toArray
      var i = 0
      var cnt = 0L
      while (i < cps.length) {
        val m = tr.longestMatch(cps, i, math.min(maxG, cps.length - i), minG)
        i += (if (m > 0) m else 1)
        cnt += 1L
      }
      total += math.max(1L, cnt)
      t += 1
    }
    total
  }

  def count(tokens: Column): Column =
    ColumnBridge.column(BpeCountExpr(ColumnBridge.expression(tokens)))
}
