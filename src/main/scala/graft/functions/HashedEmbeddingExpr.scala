package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Hashed-bigram count embedding — feature hashing (Weinberger et al.
  * 2009) over the same engine-portable bigram hash as
  * [[HashedBigramBucketsExpr]], projected to a FIXED `dim`-slot integer
  * count vector: v[h(bigram) mod dim] += 1. This is the engine-native
  * document embedder: a crawl arrives as text, and every embedding
  * consumer here (SemDeDup, the ANN family, cluster-balanced sampling)
  * needs a vector column — this produces one at scan speed with no model
  * artifact, the bag-of-hashed-ngrams baseline the DSIR featurizer
  * already trusts for importance weights.
  *
  * Hash contract: gram = left + ' ' + right over adjacent tokens; h =
  * poly fold of the gram's code points (B = 1000003, P = 2³¹ − 1, the
  * [[WinnowFingerprintExpr]] constants); slot = h mod dim. Integer counts
  * ⇒ every downstream integer-L2 / normalize-then-cosine step is
  * engine-exact, so text→embed→dedup chains keep FULL oracles. Fewer
  * than two tokens → the zero vector (callers' normalize guards keep it
  * inert).
  *
  * Why native: one generated-code pass emitting the final vector — no
  * intermediate bucket array, no explode, no per-slot interpreted filter
  * (the transform+filter restatement is O(dim·grams) per row). */
case class HashedEmbeddingExpr(child: Expression, dim: Int)
    extends UnaryExpression {
  require(dim >= 2, s"dim must be >= 2 (got $dim)")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hashed_embedding needs array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hashed_embedding"

  override def nullSafeEval(input: Any): Any =
    HashedEmbeddingExpr.compute(input.asInstanceOf[ArrayData], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.HashedEmbeddingExpr.compute($arr, $dim);")

  override protected def withNewChildInternal(newChild: Expression): HashedEmbeddingExpr =
    copy(child = newChild)
}

object HashedEmbeddingExpr {

  def compute(toks: ArrayData, dim: Int): ArrayData = {
    val out = new Array[Long](dim)
    val n = toks.numElements()
    if (n >= 2) {
      val B = WinnowFingerprintExpr.B
      val P = WinnowFingerprintExpr.P
      var i = 0
      var prev: String = null
      while (i < n) {
        // empty/null tokens BREAK the pair chain (the HashedBigramBuckets
        // contract: "empty tokens never hash") — they must not form
        // phantom grams with their neighbors when a caller passes an
        // unfiltered split
        val t0 = if (toks.isNullAt(i)) "" else toks.getUTF8String(i).toString
        val t = if (t0.isEmpty) null else t0
        if (prev != null && t != null) {
          var h = 0L
          var k = 0
          while (k < prev.length) {
            val cp = prev.codePointAt(k)
            h = (h * B + cp) % P
            k += Character.charCount(cp)
          }
          h = (h * B + ' ') % P
          k = 0
          while (k < t.length) {
            val cp = t.codePointAt(k)
            h = (h * B + cp) % P
            k += Character.charCount(cp)
          }
          out((h % dim).toInt) += 1L
        }
        prev = t
        i += 1
      }
    }
    new GenericArrayData(out)
  }

  def embed(tokens: Column, dim: Int): Column =
    ColumnBridge.column(
      HashedEmbeddingExpr(ColumnBridge.expression(tokens), dim))
}
