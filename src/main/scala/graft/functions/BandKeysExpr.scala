package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native LSH band keys: band b's key = xxhash64 chain over the signature
  * slice sig[b·r .. b·r+r) (seed 42, `h = hashLong(x, h)` per element — the
  * same primitive Spark's own multi-arg xxhash64 folds with).
  *
  * Replaces the HOF shape in [[graft.llm.Dedup.bandKeysHof]]
  * (`transform(sequence(0, b−1), …xxhash64(array_join(slice(sig, …), ",")))`)
  * on the production MinHash path: that form is interpreted and renders every
  * slice to a comma-joined STRING per band per row before hashing. Key
  * VALUES differ from the HOF form (long-chain vs string hash) — that is
  * fine by construction: band keys are internal join keys, equal slices
  * still collide, distinct slices collide only with 2^-64 probability, and
  * every candidate pair is re-checked downstream by the signature-agreement
  * estimate. Candidate-set equality on the fixture corpus is pinned by
  * BandKeysExprSpec.
  */
case class BandKeysExpr(child: Expression, bands: Int, rows: Int)
    extends UnaryExpression {

  require(bands > 0 && rows > 0, "bands and rows must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    // containsNull accepted (parquet round-trips type nullable); null slots
    // are SKIPPED in the band chain — never read as garbage
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"band_keys needs array<bigint>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("band", IntegerType, nullable = false),
    StructField("key", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "band_keys"

  override def nullSafeEval(input: Any): Any =
    BandKeysExpr.compute(input.asInstanceOf[ArrayData], bands, rows)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, sig =>
      s"${ev.value} = graft.functions.BandKeysExpr.compute($sig, $bands, $rows);")

  override protected def withNewChildInternal(newChild: Expression): BandKeysExpr =
    copy(child = newChild)
}

object BandKeysExpr {

  private val Seed = 42L

  /** Shared by eval and generated code. Slices beyond the signature length
    * hash over the available prefix (signatures are k = bands·rows wide by
    * construction, so this is a never-hit guard, not a semantic). */
  def compute(sig: ArrayData, bands: Int, rows: Int): GenericArrayData = {
    val n = sig.numElements()
    val out = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      var h = Seed
      var i = b * rows
      val end = math.min(i + rows, n)
      while (i < end) {
        if (!sig.isNullAt(i)) h = XXH64.hashLong(sig.getLong(i), h)
        i += 1
      }
      out(b) = new GenericInternalRow(Array[Any](b, h)): InternalRow
      b += 1
    }
    new GenericArrayData(out)
  }

  def keys(sig: Column, bands: Int, rows: Int): Column =
    ColumnBridge.column(
      BandKeysExpr(ColumnBridge.expression(sig), bands, rows))
}
