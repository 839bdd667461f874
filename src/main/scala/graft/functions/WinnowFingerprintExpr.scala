package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03 —
  * the MOSS algorithm): hash every k-character gram with a polynomial
  * rolling hash, slide a w-gram window over the hash sequence, and keep the
  * minimum of each window. The resulting distinct-min set is a position-
  * independent fingerprint with the winnowing guarantee: any substring two
  * documents share of length ≥ k + w − 1 characters contributes at least
  * one COMMON fingerprint — substring-level (copy/paste) duplication that
  * set-of-shingles Jaccard dilutes away on long documents.
  *
  * Engine-portable by construction, like LangIdScoresExpr/BpeCountExpr: the
  * hash is integer arithmetic (h = (h·B + c) mod P over code points, B =
  * 1000003, P = 2³¹ − 1) that DuckDB restates verbatim with ord/substr, so
  * the production query is FULL-oracle — no xxhash twin needed. All
  * intermediates fit int64: h < P ≈ 2.1e9, h·B ≈ 2.1e15, c·B^(k−1) mod P
  * intermediate ≈ 2.4e15 — both engines' 64-bit lanes never overflow.
  *
  * Why native: one O(n) pass — rolling gram hash (drop the leading char's
  * B^(k−1) term, shift, add the new char) plus a monotonic-deque sliding
  * minimum — inside whole-stage codegen. The per-position restatement is
  * O(n·k) + O(n·w) interpreted lambdas; WinnowExprSpec pins this rolling
  * form bit-identical to that naive shape.
  *
  * Contract (mirrored by the oracle SQL):
  *   grams    g[p] = hash(chars p..p+k−1), p = 1..n−k+1 (code points);
  *   windows  p = 1..max(ng−w+1, 1), min over g[p..min(p+w−1, ng)]
  *            (one truncated window when 0 < ng < w);
  *   result   distinct mins, ascending; empty array when n < k.
  */
case class WinnowFingerprintExpr(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 2 && w >= 1, s"winnow needs k >= 2, w >= 1 (got k=$k, w=$w)")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprints needs string, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  override def nullSafeEval(input: Any): Any =
    WinnowFingerprintExpr.compute(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.WinnowFingerprintExpr.compute($s, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprintExpr =
    copy(child = newChild)
}

object WinnowFingerprintExpr {

  val P: Long = 2147483647L // 2^31 − 1 (Mersenne prime)
  val B: Long = 1000003L

  def compute(text: UTF8String, k: Int, w: Int): GenericArrayData = {
    val s = text.toString
    // code points, not UTF-16 units: DuckDB's substr/ord walk characters
    val cps = s.codePoints().toArray
    val n = cps.length
    val ng = n - k + 1
    if (ng < 1) return new GenericArrayData(Array.emptyLongArray)
    // B^(k−1) mod P — the leading char's weight, dropped on each roll
    var bk1 = 1L
    var i = 0
    while (i < k - 1) { bk1 = bk1 * B % P; i += 1 }
    val grams = new Array[Long](ng)
    var h = 0L
    i = 0
    while (i < k) { h = (h * B + cps(i)) % P; i += 1 }
    grams(0) = h
    var p = 1
    while (p < ng) {
      var t = (h - cps(p - 1) * bk1 % P) % P
      if (t < 0) t += P
      h = (t * B + cps(p + k - 1)) % P
      grams(p) = h
      p += 1
    }
    val nw = math.max(ng - w + 1, 1)
    // monotonic deque sliding minimum: each gram index enters and leaves
    // the candidate queue once — O(ng) total, any w
    val deque = new Array[Int](ng)
    var head = 0
    var tail = 0 // exclusive
    val mins = new java.util.TreeSet[java.lang.Long]()
    var end = 0 // grams consumed (exclusive)
    p = 0
    while (p < nw) {
      val winEnd = math.min(p + w, ng) // exclusive
      while (end < winEnd) {
        while (tail > head && grams(deque(tail - 1)) >= grams(end)) tail -= 1
        deque(tail) = end
        tail += 1
        end += 1
      }
      while (deque(head) < p) head += 1
      mins.add(grams(deque(head)))
      p += 1
    }
    val out = new Array[Long](mins.size())
    val it = mins.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  /** Readable O(n·k + n·w) reference shape — the per-position fold the
    * oracle SQL restates; WinnowExprSpec pins [[compute]] against it. */
  def computeNaive(s: String, k: Int, w: Int): Array[Long] = {
    val cps = s.codePoints().toArray
    val n = cps.length
    val ng = n - k + 1
    if (ng < 1) return Array.emptyLongArray
    val grams = (0 until ng).map { p =>
      var h = 0L
      (0 until k).foreach(j => h = (h * B + cps(p + j)) % P)
      h
    }
    val nw = math.max(ng - w + 1, 1)
    (0 until nw).map(p => grams.slice(p, math.min(p + w, ng)).min)
      .distinct.sorted.toArray
  }

  def fingerprints(text: Column, k: Int, w: Int): Column =
    ColumnBridge.column(WinnowFingerprintExpr(ColumnBridge.expression(text), k, w))
}
