package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Hashes of every `w`-token sliding window (hop 1) — the unit of exact
  * substring deduplication (Lee et al. 2022, "Deduplicating Training Data
  * Makes Language Models Better"): two documents sharing a run of ≥ w
  * consecutive tokens share at least one window hash, so a keyed join on
  * the hash finds cross-document copied SPANS that document-level and
  * shingle-set dedup both dilute away.
  *
  * Hash contract (engine-portable, the [[WinnowFingerprintExpr]] family):
  * window string = tokens i..i+w−1 joined by ' '; h = fold over its CODE
  * POINTS of (h·B + cp) mod P, B = 1000003, P = 2³¹ − 1 — restated in
  * DuckDB as list_reduce over array_to_string(t[i:i+w−1], ' '). Output:
  * hashes at window starts 1..n−w+1; fewer than w tokens → empty array.
  * Null tokens hash as empty strings (split() never yields them).
  *
  * Why native: one generated-code pass per row; the per-window char walk
  * is O(n·w·len̄) with w a small literal — no interpreted lambdas, no
  * string materialization per window.
  *
  * The (b, p) pair defaults to the 31-bit oracle contract above; callers
  * needing an INDEPENDENT second hash (span-dedup's collision guard) pass
  * [[TokenWindowHashesExpr.B2]]/[[TokenWindowHashesExpr.P2]] — p must stay
  * under 2⁴² so `h·b + cp` fits signed 64-bit in both engines. */
case class TokenWindowHashesExpr(child: Expression, w: Int,
    b: Long = WinnowFingerprintExpr.B, p: Long = WinnowFingerprintExpr.P)
    extends UnaryExpression {
  // w = 1 degenerates to the plain per-token code-point fold (no ' '
  // joiner ever fires) — the portable single-string hash the host-keyed
  // split rides; restated by the same polyHashSql list_reduce
  require(w >= 1, s"window width must be >= 1 (got $w)")
  require(p > 1 && (p - 1) <= (Long.MaxValue - 0x10FFFF) / b,
    s"modulus $p overflows 64-bit fold with base $b")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_window_hashes needs array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_window_hashes"

  override def nullSafeEval(input: Any): Any =
    TokenWindowHashesExpr.compute(input.asInstanceOf[ArrayData], w, b, p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.TokenWindowHashesExpr.compute($arr, $w, ${b}L, ${p}L);")

  override protected def withNewChildInternal(newChild: Expression): TokenWindowHashesExpr =
    copy(child = newChild)
}

object TokenWindowHashesExpr {

  /** Second-hash constants for span-dedup's collision guard: an
    * INDEPENDENT base (next prime after B) and a ~41-bit prime modulus
    * (largest prime under 2⁴¹) — large enough that a simultaneous
    * (h, h2) collision is a ~2⁻⁷² event, small enough that the fold's
    * `h·B2 + cp` stays inside signed 64-bit in both Java and DuckDB. */
  val B2: Long = 1000033L
  val P2: Long = 2199023255531L // largest prime < 2^41

  def compute(toks: ArrayData, w: Int, B: Long, P: Long): ArrayData = {
    val n = toks.numElements()
    if (n < w) return new GenericArrayData(Array.empty[Long])
    val words = new Array[String](n)
    var i = 0
    while (i < n) {
      words(i) = if (toks.isNullAt(i)) "" else toks.getUTF8String(i).toString
      i += 1
    }
    val out = new Array[Long](n - w + 1)
    var s = 0
    while (s <= n - w) {
      var h = 0L
      var j = 0
      while (j < w) {
        if (j > 0) h = (h * B + ' ') % P
        val word = words(s + j)
        var k = 0
        while (k < word.length) {
          val cp = word.codePointAt(k)
          h = (h * B + cp) % P
          k += Character.charCount(cp)
        }
        j += 1
      }
      out(s) = h
      s += 1
    }
    new GenericArrayData(out)
  }

  def hashes(tokens: Column, w: Int): Column =
    ColumnBridge.column(
      TokenWindowHashesExpr(ColumnBridge.expression(tokens), w))

  /** The independent (B2, P2) window hash — span-dedup's second opinion:
    * a cut happens only when BOTH hashes agree, so a 31-bit birthday
    * collision can never delete an innocent span. */
  def hashes2(tokens: Column, w: Int): Column =
    ColumnBridge.column(
      TokenWindowHashesExpr(ColumnBridge.expression(tokens), w, B2, P2))
}
