package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the conditional-trigram-LM perplexity score: native ≡ HOF twin,
  * build-time profile invariants, and the signal's direction (fluent
  * English scores under noise scores under fully-unseen scripts). */
class LmScoreSpec extends SparkSpec {

  private val fixtures = Seq(
    "The train arrived on time and the streets were quiet before dinner.",
    "She walked along the river in the first hour of the day.",
    "batch window spark merge value table part agg join small line",
    "xq zv jj wq kx vv zz qq xx jv kq zx",
    "今天早晨天气晴朗而寒冷商店开门之前街道很安静",
    "mixed English text avec un peu de français und etwas Deutsch",
    "a", "", " ", "ab",
    "emoji 😀😀 inside the sentence")

  test("native lm_nll is bit-identical to the HOF literal-map fold") {
    import spark.implicits._
    val df = fixtures.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"), LangId.padded(col("text")).as("p"))
    val rows = df.select(col("id"), LmScore.nll(col("p")).as("native"),
        LmScore.nllHof(col("p")).as("hof"))
      .orderBy(col("id")).collect()
    rows.foreach(r => assert(r.getLong(1) === r.getLong(2),
      s"fixture ${r.getLong(0)}"))
  }

  test("profile invariants: every seen cost positive and under the floor") {
    assert(LmScore.costs.nonEmpty)
    assert(LmScore.costs.values.forall(c => c > 0 && c < LmScore.UnseenCost))
    // the floor is ln(SmoothV) scaled: −round(1000·ln(1/4096)) = 8318
    assert(LmScore.UnseenCost === 8318L)
  }

  test("signal direction: English < noise; unseen scripts sit AT the floor") {
    import spark.implicits._
    val en = "The weather this morning was clear and cold and the train arrived on time."
    val noise = "zz qq xv jk wq table spark value merge window batch part"
    val zh = "今天早晨天气晴朗而寒冷商店开门之前街道很安静"
    val df = Seq((1L, en), (2L, noise), (3L, zh)).toDF("id", "text")
      .select(col("id"), LangId.padded(col("text")).as("p"))
      .select(col("id"), LmScore.nll(col("p")).as("nll"),
        LangId.nWindows(col("p")).as("nw"))
      .select(col("id"),
        LmScore.nllPerWindow(col("nll"), col("nw")).as("mw"))
      .orderBy(col("id")).collect().map(_.getLong(1))
    val Array(enMw, noiseMw, zhMw) = df
    assert(enMw < noiseMw, s"en=$enMw noise=$noiseMw")
    // every zh window is unseen → nll = nw·UnseenCost exactly
    assert(zhMw === LmScore.UnseenCost)
    assert(noiseMw <= LmScore.UnseenCost)
  }

  test("fuzz: native ≡ HOF over 600 mixed-alphabet random strings") {
    import spark.implicits._
    // seeded: the failing case is reproducible from its index
    val rnd = new scala.util.Random(0xC0FFEE)
    val alphabets = Seq(
      "abcdefghij the and was ", // seen-trigram-rich ASCII
      "ÀàßçñøÅåÉé üöä ",         // accented Latin
      "今天早晨天气晴朗而寒冷",      // CJK (all unseen)
      "😀🚂🌊",                   // supplementary-plane (2 UTF-16 units each)
      " \t\n  ",                 // whitespace runs (normalize collapses)
      "a'b\"c\\d|e")             // quoting/escape hazards
    val cases = (0 until 600).map { i =>
      val ab = alphabets(i % alphabets.length) +
        alphabets(rnd.nextInt(alphabets.length))
      val cps = ab.codePoints().toArray
      val len = rnd.nextInt(40)
      val sb = new java.lang.StringBuilder
      (0 until len).foreach(_ => sb.appendCodePoint(cps(rnd.nextInt(cps.length))))
      (i.toLong, sb.toString)
    }
    val bad = cases.toDF("id", "text")
      .select(col("id"), LangId.padded(col("text")).as("p"))
      .select(col("id"), LmScore.nll(col("p")).as("native"),
        LmScore.nllHof(col("p")).as("hof"))
      .filter(col("native") =!= col("hof"))
      .collect()
    assert(bad.isEmpty, s"native/HOF divergence on seeds: ${bad.map(_.getLong(0)).mkString(",")}")
  }

  test("zero-window text scores nll 0 and per-window 0") {
    import spark.implicits._
    val r = Seq((1L, "")).toDF("id", "text")
      .select(col("id"), LangId.padded(col("text")).as("p"))
      .select(LmScore.nll(col("p")).as("nll"),
        LmScore.nllPerWindow(LmScore.nll(col("p")),
          LangId.nWindows(col("p"))).as("mw"))
      .collect().head
    assert(r.getLong(0) === 0L)
    assert(r.getLong(1) === 0L)
  }
}
