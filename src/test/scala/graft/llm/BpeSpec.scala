package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.Tables

/** Pinned-vocab subword counting: vocab build determinism, native ≡ Scala
  * reference, and the r12-verdict bound properties (tokens ≤ subwords ≤
  * non-space code points). */
class BpeSpec extends SparkSpec {

  test("vocab is deterministic, bounded, and shaped for the oracle") {
    assert(Bpe.vocab.size <= Bpe.VocabSize)
    assert(Bpe.vocab.size >= 400, s"vocab too small: ${Bpe.vocab.size}")
    Bpe.vocab.keys.foreach { g =>
      val cp = g.codePointCount(0, g.length)
      assert(cp >= Bpe.MinGram && cp <= Bpe.MaxGram, s"gram '$g' length $cp")
      assert(!g.contains(" "), s"gram '$g' crosses a word boundary")
    }
    // the SQL literal block carries every gram exactly once
    assert(Bpe.vocabSqlValues.linesIterator.size === Bpe.vocab.size)
  }

  test("greedy segmentation: longest match wins, floor 1, reference sanity") {
    // 'the' is certainly a top vocab gram (every en seed sentence has it)
    assert(Bpe.vocab.contains("the"))
    assert(Bpe.countToken("the") === 1L)
    assert(Bpe.countToken("") === 1L) // empty-token floor
    assert(Bpe.countToken("q") === 1L) // below MinGram consumes singly
    // counts are monotone-bounded: 1 <= count <= codepoints for any word
    for (w <- Seq("against", "remember", "überraschte", "предстоящий",
        "possible", "zzzzqqqq", "a", "xy")) {
      val c = Bpe.countToken(w)
      val cp = w.codePointCount(0, w.length).toLong
      assert(c >= 1L && c <= math.max(1L, cp), s"'$w' count $c of $cp cps")
    }
    // a vocab match actually compresses: a word made of one certain gram
    // twice counts at most 2 + slack, strictly under its char count
    assert(Bpe.countToken("thethe") < 6L)
  }

  test("native expression equals the Scala reference, corpus + edge cases") {
    val s = spark
    import s.implicits._
    val edge = Seq("", " ", "a  b", "good 😀 emoji", "the quick brown fox",
      "das überraschte alle", "дети играли в парке").toDF("text")
    val docs = Tables.documents(spark, Sf).select(col("text")).limit(80)
      .unionAll(edge)
    val both = docs.select(
        Bpe.subwordCount(TextAnalysis.tokens(col("text"))).as("native"),
        col("text"))
      .collect()
    both.foreach { r =>
      val expected = r.getString(1).split(" ", -1).map(Bpe.countToken).sum
      assert(r.getLong(0) === expected, s"text '${r.getString(1)}'")
    }
  }

  test("corpus property: tokens <= subwords <= non-space code points") {
    val viol = Tables.documents(spark, Sf)
      .select(
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tok"),
        Bpe.subwordCount(TextAnalysis.tokens(col("text"))).as("n_sub"),
        (length(col("text")) - (size(TextAnalysis.tokens(col("text"))) - 1))
          .cast("long").as("n_cp"))
      .filter(col("n_sub") < col("n_tok") || col("n_sub") > col("n_cp"))
      .count()
    assert(viol === 0L)
  }
}
