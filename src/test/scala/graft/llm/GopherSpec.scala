package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Gopher repetition signals + rule battery + C4 line cleaning: handcrafted
  * fixtures per rule, a brute-force twin for the top-2-gram sorted fold
  * (including adversarial tie cases), and C4 idempotence (cleaning a cleaned
  * document is the identity — every kept line passes the keep-rule). */
class GopherSpec extends SparkSpec {

  private def one[T](c: Column, text: String): T = {
    val s = spark
    import s.implicits._
    Seq(text).toDF("text").select(c.as("v")).collect()(0).getAs[T]("v")
  }

  // ---- repetition signals ----

  test("dupLineFrac / dupLineCharFrac: repeated paragraph lights both") {
    val t = "aa bb cc\naa bb cc\ndd"
    val ls = TextAnalysis.docLines(col("text"))
    assert(one[Double](TextAnalysis.dupLineFrac(ls), t) === 1.0 / 3.0)
    // chars: lines 8+8+2=18, distinct 8+2=10 → dup char frac 8/18
    assert(one[Double](TextAnalysis.dupLineCharFrac(ls), t) === 1.0 - 10.0 / 18.0)
    assert(one[Double](TextAnalysis.dupLineFrac(ls), "x\ny") === 0.0)
    assert(one[Double](TextAnalysis.dupLineCharFrac(ls), "x\ny") === 0.0)
  }

  /** Brute-force twin: count every 2-gram, pick (max count, min gram).
    * Empty tokens from whitespace runs are not words (r14 ADVICE fix). */
  private def topBigramBrute(text: String): (Long, String) = {
    val toks = text.replace('\n', ' ').split(" ", -1).filter(_.nonEmpty)
    if (toks.length < 2) (0L, "")
    else {
      val counts = toks.sliding(2).map(_.mkString(" ")).toSeq
        .groupBy(identity).map { case (g, v) => (g, v.size.toLong) }
      val mx = counts.values.max
      (mx, counts.filter(_._2 == mx).keys.min)
    }
  }

  test("topBigram matches brute force, ties to the smallest gram") {
    val cases = Seq(
      "a b a b a",            // "a b" ×2 beats "b a" ×2? tie → "a b"
      "z y z y z y x",        // dominant "z y"
      "solo",                 // <2 tokens → (0, "")
      "a a a a",              // "a a" ×3
      "m n\nm n",             // newline-crossing gram "n m" counts once
      "a  b a b",             // double space: no phantom empty token
      "x \n y x y",           // space-adjacent newline: 'x y' crosses cleanly
      "b a b a c c b a")
    for (t <- cases) {
      for (c <- Seq(TextAnalysis.topBigram(TextAnalysis.flatTokens(col("text"))),
          TextAnalysis.topBigramHof(TextAnalysis.flatTokens(col("text"))))) {
        val got = one[org.apache.spark.sql.Row](c, t)
        val (cnt, gram) = topBigramBrute(t)
        assert(got.getAs[Long]("cnt") === cnt, s"cnt for '$t'")
        assert(got.getAs[String]("gram") === gram, s"gram for '$t'")
      }
    }
  }

  test("topBigram fuzz: 300 random streams — native ≡ HOF twin ≡ brute force") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(14)
    val texts = Seq.fill(300)(
      Seq.fill(rnd.nextInt(30))(('a' + rnd.nextInt(3)).toChar.toString)
        .mkString(" "))
    val rows = texts.toDF("text")
      .select(col("text"),
        TextAnalysis.topBigram(TextAnalysis.flatTokens(col("text"))).as("nat"),
        TextAnalysis.topBigramHof(TextAnalysis.flatTokens(col("text"))).as("hof"))
      .collect()
    rows.foreach { r =>
      val t = r.getString(0)
      val (cnt, gram) = topBigramBrute(t)
      val nat = r.getStruct(1)
      val hof = r.getStruct(2)
      assert((nat.getAs[Long]("cnt"), nat.getAs[String]("gram")) === ((cnt, gram)),
        s"native mismatch for '$t'")
      assert((hof.getAs[Long]("cnt"), hof.getAs[String]("gram")) === ((cnt, gram)),
        s"hof mismatch for '$t'")
    }
  }

  // ---- rule battery ----

  private def signals(text: String): org.apache.spark.sql.Row = {
    val s = spark
    import s.implicits._
    TextAnalysis.withGopherSignals(Seq(text).toDF("text"), col("text"))
      .collect()(0)
  }

  private val goodDoc: String = {
    // 60 plain words + the full stopword set, multi-line, no symbols
    val body = (1 to 60).map(i => s"word$i").grouped(12)
      .map(_.mkString(" ")).mkString("\n")
    body + "\nthe be to of and that have with more words here now"
  }

  test("gopher rules: the good doc passes; each mutation trips its rule") {
    val g = signals(goodDoc)
    assert(g.getAs[Boolean]("gopher_pass"), "good doc must pass")

    assert(!signals("too short but the be to of and").getAs[Boolean]("gopher_pass"),
      "short doc fails word count")
    val bulleted = goodDoc.split("\n").map("- " + _).mkString("\n")
    assert(!signals(bulleted).getAs[Boolean]("gopher_pass"), "bullets fail")
    val ellipsized = goodDoc.split("\n").map(_ + "...").mkString("\n")
    assert(!signals(ellipsized).getAs[Boolean]("gopher_pass"), "ellipses fail")
    val symbols = goodDoc + "\n" + Seq.fill(12)("#").mkString(" ")
    assert(!signals(symbols).getAs[Boolean]("gopher_pass"), "symbols fail")
    val numeric = goodDoc + "\n" + (1 to 200).map(_.toString).mkString(" ")
    assert(!signals(numeric).getAs[Boolean]("gopher_pass"),
      "numeric flood fails alpha fraction")
    val noStops = goodDoc.split("\n").dropRight(1).mkString("\n")
    assert(!signals(noStops).getAs[Boolean]("gopher_pass"),
      "one stopword is not enough")
  }

  test("by-lang rules: native prose passes its own battery, fails the en one") {
    val s = spark
    import s.implicits._
    val de = Seq.fill(3)(
      "der kleine hund läuft schnell über die grüne wiese und die katze " +
        "schläft ruhig neben dem warmen ofen im alten haus").mkString(" ")
    val ru = Seq.fill(3)(
      "маленькая собака бежит быстро по зелёному полю и кошка спит тихо " +
        "возле тёплой печки в старом доме под высоким небом").mkString(" ")
    val docs = Seq((1L, de, "de"), (2L, ru, "ru"), (3L, de, "en"),
      (4L, ru, "en")).toDF("doc_id", "text", "lang")
    val byLang = TextAnalysis.withGopherSignalsByLang(docs, col("text"),
        col("lang"))
      .select(col("doc_id"), col("gopher_pass"), col("stop_hits"),
        col("alpha_frac"))
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(byLang(1L)._1, "German prose passes under de rules")
    assert(byLang(1L)._2 >= 2L, "de stop hits found")
    assert(byLang(2L)._1, "Russian prose passes under ru rules")
    assert(byLang(2L)._3 === 1.0, "every Cyrillic token matches the ru class")
    // the SAME prose stamped 'en' fails: zero en stop hits; the Russian
    // one also zeroes en alpha_frac
    assert(!byLang(3L)._1 && byLang(3L)._2 === 0L)
    assert(!byLang(4L)._1 && byLang(4L)._3 === 0.0)
    // and the legacy en-only battery agrees with byLang on en-stamped rows
    val en = TextAnalysis.withGopherSignals(docs.filter(col("lang") === "en"),
        col("text"))
      .select(col("doc_id"), col("gopher_pass"), col("stop_hits")).collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2)))).toMap
    assert(en(3L) === ((byLang(3L)._1, byLang(3L)._2)))
    assert(en(4L) === ((byLang(4L)._1, byLang(4L)._2)))
    // unknown lang falls back to the en battery
    val und = TextAnalysis.withGopherSignalsByLang(
        Seq((9L, de, "xx")).toDF("doc_id", "text", "lang"),
        col("text"), col("lang"))
      .select(col("stop_hits")).collect()(0).getLong(0)
    assert(und === 0L)
  }

  test("gopher signals ignore whitespace runs (the paper's word definition)") {
    // double space + space-adjacent newline: 6 real words, no empties
    val g = signals("aa  bbb cc \ndd ee ffff")
    assert(g.getAs[Long]("n_words") === 6L)
    assert(g.getAs[Double]("mean_word_len") === (2 + 3 + 2 + 2 + 2 + 4) / 6.0)
    assert(g.getAs[Double]("alpha_frac") === 1.0)
    // all-whitespace doc: zero words, ratios 0, composite false — no NaN
    val z = signals("  \n ")
    assert(z.getAs[Long]("n_words") === 0L)
    assert(z.getAs[Double]("mean_word_len") === 0.0)
    assert(z.getAs[Double]("alpha_frac") === 0.0)
    assert(!z.getAs[Boolean]("gopher_pass"))
  }

  test("gopher signal arithmetic on a handcrafted doc") {
    val g = signals("aa bbb\n- cc the dd...\nof #")
    assert(g.getAs[Long]("n_words") === 8L)
    assert(g.getAs[Long]("stop_hits") === 2L) // the, of
    assert(g.getAs[Double]("bullet_frac") === 1.0 / 3.0)
    assert(g.getAs[Double]("ellipsis_frac") === 1.0 / 3.0)
    assert(g.getAs[Double]("symbol_ratio") === 2.0 / 8.0) // '#' and 'dd...'
    assert(g.getAs[Double]("alpha_frac") === 6.0 / 8.0)   // '-' and '#' fail
  }

  // ---- C4 cleaning ----

  test("c4 line rule: terminal punctuation, ≥5 words, no javascript") {
    val s = spark
    import s.implicits._
    val keep = Seq(
      "one two three four five.",    // keeps
      "one two three four five!",    // keeps
      "one two three four five",     // no terminal punct
      "four words only here.",       // <5 words
      "please enable JavaScript to view this.", // javascript (case-folded)
      "she said \"go ahead and do it\"")        // quote terminal keeps
      .toDF("l")
      .select(TextAnalysis.c4KeepLine(col("l")).as("k"))
      .collect().map(_.getBoolean(0)).toSeq
    assert(keep === Seq(true, true, false, false, false, true))
  }

  test("c4 cleaning is idempotent: kept lines all pass the keep-rule") {
    val t = "one two three four five.\nshort.\nsix seven eight nine ten eleven?"
    val ls = TextAnalysis.docLines(col("text"))
    val cleaned = one[String](
      concat_ws("\n", TextAnalysis.c4KeptLines(ls)), t)
    assert(cleaned === "one two three four five.\nsix seven eight nine ten eleven?")
    val recleaned = one[String](
      concat_ws("\n", TextAnalysis.c4KeptLines(ls)), cleaned)
    assert(recleaned === cleaned)
  }

  test("c4 doc rule: lorem ipsum, brace, and <3 kept lines each reject") {
    val s = spark
    import s.implicits._
    def kept(text: String, k: Int): Boolean =
      Seq((text, k)).toDF("text", "k")
        .select(TextAnalysis.c4DocKeep(col("text"), col("k")).as("v"))
        .collect()(0).getBoolean(0)
    assert(kept("fine document body", 3))
    assert(!kept("fine document body", 2))
    assert(!kept("has Lorem Ipsum inside", 3))
    assert(!kept("code { inside }", 3))
  }
}
