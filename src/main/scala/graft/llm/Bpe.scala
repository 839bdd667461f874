package graft.llm

import org.apache.spark.sql.Column

/** Pinned-vocabulary subword counting — the r12 verdict's upgrade over the
  * ceil(len/4) chars-per-token heuristic: token budgets (sequence packing,
  * corpus token mass) should count what a trainer's tokenizer would
  * actually emit, and a greedy longest-match over a FIXED literal
  * vocabulary is the engine-portable core of that (BPE inference IS greedy
  * segmentation over a learned merge vocabulary; the learning step is
  * offline, the vocab is pinned here the way [[LangId.profile]] pins its
  * weights).
  *
  * Vocabulary: built at library build time from the SAME hand-written seed
  * prose as the langid profiles ([[LangId.Seeds]]) — within-word character
  * n-grams ([[MinGram]]..[[MaxGram]]) counted across all languages, top
  * [[VocabSize]] by (count desc, gram asc) — a total order, so the vocab is
  * build-deterministic and [[vocabSqlValues]] hands the DuckDB oracle the
  * identical literal set.
  *
  * Segmentation contract (all three implementations — the native
  * expression [[graft.functions.BpeCountExpr]], the Scala reference
  * [[countToken]], and the oracle's recursive walk — are pinned equal):
  * walk the token left to right in CODE POINTS; at each position consume
  * the LONGEST vocab gram matching there (lengths [[MaxGram]] down to
  * [[MinGram]]), else consume one code point; each consumption counts one
  * subword; an empty token counts 1 (floor shared with the token-count
  * semantics). Properties: tokens ≤ subwords ≤ non-space code points (for
  * non-empty tokens).
  *
  * 100 TB shape: a per-row projection over the token array — one
  * generated-code pass, no shuffle, composes with the packing fold. */
object Bpe {

  val MinGram = 2
  val MaxGram = 6
  val VocabSize = 512

  // the vocab is built "from the SAME seed prose as the langid profiles" —
  // that premise requires the SAME normalization, so this is LangId's own
  // helper, not a copy that could drift
  private def normalizeStr(s: String): String = LangId.normalizeStr(s)

  /** gram → true (a Set would do; Map keeps the build counts inspectable
    * in tests). Grams are code-point substrings of seed WORDS — no
    * cross-word grams, no whitespace inside a gram. */
  lazy val vocab: Map[String, Long] = {
    val counts = scala.collection.mutable.HashMap.empty[String, Long]
    LangId.Seeds.values.foreach { seed =>
      normalizeStr(seed).split(' ').foreach { word =>
        val cps = word.codePoints().toArray
        var i = 0
        while (i < cps.length) {
          var l = MinGram
          while (l <= MaxGram && i + l <= cps.length) {
            val g = new String(cps, i, l)
            counts.update(g, counts.getOrElse(g, 0L) + 1L)
            l += 1
          }
          i += 1
        }
      }
    }
    counts.toSeq.sortBy { case (g, c) => (-c, g) }.take(VocabSize).toMap
  }

  /** Reference greedy segmenter (the native expression's pinned twin). */
  def countToken(token: String): Long = {
    val cps = token.codePoints().toArray
    var i = 0
    var cnt = 0L
    while (i < cps.length) {
      var consumed = 1
      var l = math.min(MaxGram, cps.length - i)
      var found = false
      while (!found && l >= MinGram) {
        if (vocab.contains(new String(cps, i, l))) { consumed = l; found = true }
        l -= 1
      }
      i += consumed
      cnt += 1L
    }
    math.max(1L, cnt)
  }

  /** Total subword count over a token-array column — native generated-code
    * pass ([[graft.functions.BpeCountExpr]]). */
  def subwordCount(tokens: Column): Column =
    graft.functions.BpeCountExpr.count(tokens)

  private def sqlQuote(s: String): String = "'" + s.replace("'", "''") + "'"

  /** `(g)` VALUES rows for the oracle — the same literal vocab the
    * expression matches against. */
  lazy val vocabSqlValues: String =
    vocab.keys.toSeq.sorted.map(g => s"(${sqlQuote(g)})").mkString(",\n")
}
