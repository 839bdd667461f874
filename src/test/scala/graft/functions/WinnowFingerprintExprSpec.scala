package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.llm.{Dedup, TextAnalysis}
import graft.model.Tables

/** The rolling-hash + monotonic-deque winnowing expression must be
  * bit-identical to the naive per-position fold the oracle SQL restates —
  * fingerprint profiles, the df cut, and the near-dup pair set all derive
  * from these values. */
class WinnowFingerprintExprSpec extends SparkSpec {

  private val K = 12
  private val W = 8

  test("rolling compute == naive per-position fold on the documents corpus") {
    val rows = Tables.documents(spark, Sf)
      .select(col("doc_id"), TextAnalysis.normalize(col("text")).as("nt"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nt = r.getString(1)
      val rolling = WinnowFingerprintExpr.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(nt), K, W)
        .toLongArray()
      assert(rolling.toSeq === WinnowFingerprintExpr.computeNaive(nt, K, W).toSeq,
        s"doc ${r.getLong(0)}")
    }
  }

  test("rolling == naive across k/w and adversarial inputs, incl. non-ASCII") {
    // deterministic pseudo-random corpus: repetitive runs (deque stress),
    // boundary lengths around k and k+w, multi-byte code points incl. a
    // supplementary-plane char (code-POINT walk, not UTF-16 units)
    val rnd = new scala.util.Random(42)
    // draw whole CODE POINTS (charAt would split the surrogate pair of 😀
    // into lone surrogates, which don't round-trip through UTF8String)
    val alphabets: Seq[IndexedSeq[String]] =
      Seq("ab", "abcde ", "質問日本語テスト", "a😀b ").map(s =>
        s.codePoints().toArray.toIndexedSeq
          .map(cp => new String(Character.toChars(cp))))
    val cases = Seq("", "a", "aaaaaaaaaaaa", "aaaaaaaaaaaaaaaaaaaa") ++
      (1 to 200).map { _ =>
        val alpha = alphabets(rnd.nextInt(alphabets.size))
        val n = rnd.nextInt(40)
        (0 until n).map(_ => alpha(rnd.nextInt(alpha.size))).mkString
      }
    for {
      k <- Seq(2, 5, 12)
      w <- Seq(1, 4, 8)
      s <- cases
    } {
      val rolling = WinnowFingerprintExpr.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(s), k, w)
        .toLongArray()
      assert(rolling.toSeq === WinnowFingerprintExpr.computeNaive(s, k, w).toSeq,
        s"k=$k w=$w s='$s'")
    }
  }

  test("contract edges: n<k empty, n==k one gram, truncated single window") {
    def fp(s: String, k: Int, w: Int): Seq[Long] =
      WinnowFingerprintExpr.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(s), k, w)
        .toLongArray().toSeq
    assert(fp("abcdefghijk", K, W).isEmpty)         // 11 chars < k=12
    assert(fp("abcdefghijkl", K, W).size === 1)      // exactly one gram
    // ng=3 < w=8: ONE window over all grams — a single fingerprint
    assert(fp("abcdefghijklmn", K, W).size === 1)
    val all3 = WinnowFingerprintExpr.computeNaive("abcdefghijklmn", K, 1)
    assert(fp("abcdefghijklmn", K, W).head === all3.min)
  }

  test("winnowing guarantee: a shared >= k+w-1 char span yields a common fingerprint") {
    val span = "the quick brown fox jumps over" // 30 chars > k+w-1 = 19
    val a = s"left padding text $span and some tail a"
    val b = s"completely different prefix here $span other suffix b"
    def set(s: String) = WinnowFingerprintExpr.computeNaive(s, K, W).toSet
    assert(set(a).intersect(set(b)).nonEmpty)
  }

  test("winnowPairs finds the planted near-dup and the df cap drops hot fingerprints") {
    import spark.implicits._
    val boiler = "shared boilerplate header every document carries verbatim"
    // 40 docs sharing only boilerplate + one planted near-dup pair
    val unique = (1 to 40).map(i =>
      (i.toLong, s"$boiler unique body $i ${"filler%d ".format(i * 7)} end"))
    val planted = Seq(
      (100L, "an original document body with its own long distinctive phrasing inside"),
      (101L, "an original document body with its own long distinctive phrasing inside plus tail"))
    val docs = (unique ++ planted).toDF("doc_id", "text")
    val pairs = Dedup.winnowPairs(docs, col("doc_id"), col("text"),
        k = K, w = W, dfCap = 8, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((100L, 101L)), s"planted pair missing from $pairs")
    // the boilerplate fingerprints have df=42 > cap=8 and must be dropped:
    // no unique-body pair may survive on boilerplate evidence alone
    assert(pairs.forall { case (a, b) => !(a <= 40 && b <= 40) },
      s"boilerplate-only pair leaked through the df cap: $pairs")
    // control: with the cap lifted, boilerplate-only overlap reappears in
    // the candidate pool (proves the cap, not luck, did the filtering)
    val uncapped = Dedup.winnowPairs(docs, col("doc_id"), col("text"),
        k = K, w = W, dfCap = 1000, threshold = 0.01)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(uncapped.exists { case (a, b) => a <= 40 && b <= 40 })
  }
}
