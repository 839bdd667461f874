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

  // ---- merge training ----

  /** Single-JVM reference trainer: same statistic (all adjacent
    * occurrences), same tie order, same left-to-right non-overlapping
    * apply — but on plain Scala collections. */
  private def trainBrute(docs: Seq[String], rounds: Int): Seq[(Long, String, String, Long)] = {
    // CODE-POINT split (matching the r19 trainer contract) — Java's
    // split("") cuts between code units and would shear surrogate pairs
    def cpSplit(w: String): Vector[String] =
      w.codePoints().toArray.toVector.map(cp => new String(Character.toChars(cp)))
    var words: Map[Vector[String], Long] = docs.flatMap(_.split(" "))
      .filter(_.nonEmpty).groupBy(identity).view
      .mapValues(_.size.toLong).toMap
      .map { case (w, f) => cpSplit(w) -> f }
    val out = Seq.newBuilder[(Long, String, String, Long)]
    for (r <- 0 until rounds) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((syms, f) <- words; i <- 0 until syms.length - 1)
        counts.update((syms(i), syms(i + 1)),
          counts.getOrElse((syms(i), syms(i + 1)), 0L) + f)
      if (counts.nonEmpty) {
        val ((l, rr), c) = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
        out += ((r.toLong, l, rr, c))
        words = words.map { case (syms, f) =>
          val nb = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == rr) {
              nb += (l + rr); i += 2
            } else { nb += syms(i); i += 1 }
          }
          nb.result() -> f
        } // merged keys cannot collide: distinct words stay distinct
      }
    }
    out.result()
  }

  private def trainSpark(docs: Seq[String], rounds: Int): Seq[(Long, String, String, Long)] = {
    val s = spark
    import s.implicits._
    Bpe.trainMerges(docs.toDF("text"), col("text"), rounds)
      .orderBy("merge_rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
  }

  test("trainMerges: the textbook low/lower/lowest example") {
    // freqs: low×5 lower×2 newest×6 widest×3 → 'es' wins round 0 (9),
    // then 'est' (9) — merges build on merged symbols
    val docs = Seq(
      ("low " * 5).trim, ("lower " * 2).trim,
      ("newest " * 6).trim, ("widest " * 3).trim)
    val got = trainSpark(docs, 4)
    assert(got === trainBrute(docs, 4))
    assert(got.head._2 === "e" && got.head._3 === "s" && got.head._4 === 9L)
    assert(got(1)._2 === "es" && got(1)._3 === "t" && got(1)._4 === 9L,
      "round 1 must merge the ROUND-0 SYMBOL, not raw chars")
  }

  test("trainMerges: overlapping runs count all occurrences, merge non-overlapping") {
    // 'aaaa': pairs (a,a)×3 counted; apply → [aa, aa]; round 1 merges
    // (aa,aa) once
    val got = trainSpark(Seq("aaaa"), 2)
    assert(got === Seq((0L, "a", "a", 3L), (1L, "aa", "aa", 1L)))
  }

  test("trainMerges: merges apply to WHOLE symbols, not string suffixes (r14 ADVICE)") {
    // round 0 merges (a,b) cnt 6 → the word 'abc' becomes [ab, c]; round 1
    // merges (b,c) cnt 4, which must NOT match inside [ab, c] (b is a
    // suffix of the symbol 'ab') — the buggy joined-string replace
    // corrupted it to the single symbol 'abc' and exhausted at 2 merges
    val docs = Seq(("ab " * 5).trim, ("bc " * 4).trim, "abc")
    val got = trainSpark(docs, 3)
    assert(got === trainBrute(docs, 3))
    assert(got === Seq((0L, "a", "b", 6L), (1L, "b", "c", 4L),
      (2L, "ab", "c", 1L)),
      "true symbol-level BPE yields 3 merges on this corpus")
  }

  test("learnedSubwordCount matches a symbol-level replay, boundary cases included") {
    val s = spark
    import s.implicits._
    val merges = Seq(("a", "b"), ("b", "c"), ("ab", "c"))
    def brute(word: String): Long = {
      if (word.isEmpty) return 1L // the empty-token floor
      // code-point symbols — java String.split("") would split surrogate
      // pairs, which Spark's split(t, '') does NOT; the engines' shared
      // contract is code points
      var syms = word.codePoints().toArray
        .map(cp => new String(Character.toChars(cp))).toVector
      for ((l, r) <- merges) {
        val nb = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
            nb += (l + r); i += 2
          } else { nb += syms(i); i += 1 }
        }
        syms = nb.result()
      }
      syms.length.toLong
    }
    // the emoji case pins the code-UNIT symbol contract (Java split(''),
    // shared by the HOF twin and trainMerges' documented ASCII posture):
    // brute's split('') produces the same surrogate-half symbols
    val texts = Seq("abc", "ab bc abc", "aabbcc babc cabca", "b c bc cb",
      "abcabc abcbc", "a", "zzz", "a  b", "😀abc a😀bc")
    val got = texts.toDF("text")
      .select(col("text"),
        Bpe.learnedSubwordCount(
          TextAnalysis.tokens(col("text")), merges).as("n"),
        Bpe.learnedSubwordCountHof(
          TextAnalysis.tokens(col("text")), merges).as("nh"))
      .collect()
    got.foreach { r =>
      val expected = r.getString(0).split(" ", -1).map(brute).sum
      assert(r.getLong(1) === expected, s"native for '${r.getString(0)}'")
      assert(r.getLong(2) === expected, s"hof for '${r.getString(0)}'")
    }
  }

  test("learned BPE expressions compile under CODEGEN_ONLY (no interpreted fallback)") {
    // r21: the generated cast for the merge-table reference was a generic
    // ARRAY cast ("(scala.Tuple2<String, String>[]) references[i]") which
    // Janino cannot parse — codegen failed and every learned-BPE stage
    // silently ran interpreted. CODEGEN_ONLY makes any such failure loud.
    val s = spark
    import s.implicits._
    val merges = Seq(("a", "b"), ("ab", "c"))
    val vocab = Seq("a", "b", "c") ++ merges.map { case (l, r) => l + r }
    val key = "spark.sql.codegen.factoryMode"
    val prior = s.conf.getOption(key)
    s.conf.set(key, "CODEGEN_ONLY")
    try {
      val rows = Seq("abc ab a", "cab abc").toDF("text")
        .select(
          Bpe.learnedSubwordCount(TextAnalysis.tokens(col("text")), merges)
            .as("n"),
          Bpe.tokenizeIds(TextAnalysis.tokens(col("text")), merges, vocab)
            .as("ids"))
        .collect()
      assert(rows.map(_.getLong(0)).toSeq === Seq(3L, 3L))
    } finally prior.fold(s.conf.unset(key))(v => s.conf.set(key, v))
  }

  test("tokenizeIds: id sequence matches a by-hand walk; UNK; count parity") {
    val s = spark
    import s.implicits._
    val merges = Seq(("a", "b"), ("ab", "c"))
    // vocab: base chars a,b,c,d -> 0..3; merges "ab" -> 4, "abc" -> 5
    val vocab = Seq("a", "b", "c", "d") ++ merges.map { case (l, r) => l + r }
    val got = Seq(
      "abc d",      // [abc] [d] -> 5, 3
      "ab ba cab",  // [ab]=4, b=1 a=0, c=2 [ab]=4
      "zq",         // unknown chars -> -1 -1
      "a  b"        // empty token between: emits nothing
    ).toDF("text")
      .select(col("text"),
        Bpe.tokenizeIds(TextAnalysis.tokens(col("text")), merges, vocab)
          .as("ids"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(got("abc d") === Seq(5L, 3L))
    assert(got("ab ba cab") === Seq(4L, 1L, 0L, 2L, 4L))
    assert(got("zq") === Seq(-1L, -1L))
    assert(got("a  b") === Seq(0L, 1L))
    // first-wins on a vocab string collision
    val dupVocab = Seq("a", "b", "ab", "ab")
    val dup = Seq("ab").toDF("text")
      .select(Bpe.tokenizeIds(TextAnalysis.tokens(col("text")),
        Seq(("a", "b")), dupVocab).as("ids"))
      .collect()(0).getSeq[Long](0)
    assert(dup === Seq(2L))
    // count parity on the corpus: docs here have no empty tokens, so
    // |ids| must equal learnedSubwordCount exactly
    val corpusMerges = Bpe.trainMerges(Tables.documents(spark, Sf),
        col("text"), rounds = 3)
      .orderBy(col("merge_rank")).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val corpusVocab = Bpe.idVocab(Tables.documents(spark, Sf), col("text"),
      corpusMerges)
    assert(corpusVocab.distinct.length >= corpusVocab.length - corpusMerges.length,
      "base segment must be duplicate-free")
    val rows = Tables.documents(spark, Sf)
      .select(
        size(Bpe.tokenizeIds(TextAnalysis.tokens(col("text")),
          corpusMerges, corpusVocab)).cast("long").as("n_ids"),
        Bpe.learnedSubwordCount(TextAnalysis.tokens(col("text")),
          corpusMerges).as("n_sub"))
      .agg(sum(when(col("n_ids") =!= col("n_sub"), 1).otherwise(0)).as("bad"),
        min(col("n_ids")).as("mn"))
      .collect()(0)
    assert(rows.getLong(0) === 0L, "every doc: |ids| == subword count")
    assert(rows.getLong(1) > 0L)
  }

  test("trainMerges fuzz: 12 random corpora match the reference trainer") {
    val rnd = new scala.util.Random(41)
    for (n <- 1 to 12) {
      val docs = Seq.fill(3 + rnd.nextInt(3)) {
        Seq.fill(5 + rnd.nextInt(15))(
          Seq.fill(1 + rnd.nextInt(5))(('a' + rnd.nextInt(4)).toChar).mkString)
          .mkString(" ")
      }
      assert(trainSpark(docs, 3) === trainBrute(docs, 3), s"case $n: $docs")
    }
  }

  test("trainMerges splits base symbols by CODE POINT, not code unit") {
    // a supplementary-plane corpus: '𝕒' (U+1D552) is one code point, two
    // UTF-16 units. The most frequent pair must be the WHOLE-codepoint
    // bigram (𝕒, x) — a code-unit split would shear the surrogate pair
    // and train on lone-surrogate garbage symbols instead.
    val g = new String(Character.toChars(0x1D552))
    val docs = Seq(s"${g}x ${g}x ${g}x ${g}y")
    val got = trainSpark(docs, 1)
    assert(got === trainBrute(docs, 1))
    assert(got.head._2 === g && got.head._3 === "x" && got.head._4 === 3L,
      s"expected ($g, x) as the top merge, got ${got.head}")
  }

  private def trainBatchedSpark(docs: Seq[String], rounds: Int,
      batch: Int): Seq[(Long, String, String, Long)] = {
    val s = spark
    import s.implicits._
    Bpe.trainMergesBatched(docs.toDF("text"), col("text"), rounds, batch)
      .orderBy("merge_rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
  }

  test("trainMergesBatched at batch=1 IS the sequential trainer") {
    // the disjointness filter is vacuous at batch=1 (rank 1 always kept),
    // so round-per-merge batched training must equal trainMerges exactly
    val rnd = new scala.util.Random(47)
    val corpora = Seq(
      Seq(("low " * 5).trim, ("lower " * 2).trim,
        ("newest " * 6).trim, ("widest " * 3).trim),
      Seq("aaaa"),
      Seq(("ab " * 5).trim, ("bc " * 4).trim, "abc")) ++
      Seq.fill(5)(Seq.fill(3)(
        Seq.fill(8)(Seq.fill(1 + rnd.nextInt(5))(
          ('a' + rnd.nextInt(4)).toChar).mkString).mkString(" ")))
    corpora.foreach { docs =>
      assert(trainBatchedSpark(docs, 3, 1) === trainSpark(docs, 3),
        s"batch=1 diverged on $docs")
    }
  }

  test("trainMergesBatched: disjoint selection, chained apply, progress") {
    // freqs chosen so the top candidates interact: 'ab'×6, 'bc'×5, 'cd'×4
    // over words that chain them. Ranked pairs round 0 over
    // {abcd×3, ab×3, bc×2, cd×1}: (a,b)=6, (b,c)=5, (c,d)=4 — (b,c)
    // conflicts with (a,b) (shares b) and is SKIPPED; (c,d) conflicts with
    // (b,c) among CANDIDATES (shares c), so the conservative rule skips it
    // too (sequential greedy would keep it — that's the documented
    // difference); round 0 keeps exactly [(a,b)].
    val docs = Seq(("abcd " * 3).trim, ("ab " * 3).trim,
      ("bc " * 2).trim, "cd")
    val got = trainBatchedSpark(docs, 2, 4)
    assert(got.head === ((0L, "a", "b", 6L)))
    // round 0 kept ONLY (a,b), so rank 1 comes from round 1's recount
    // AFTER the apply: abcd → [ab, c, d] leaves (c,d)=3+1=4 over
    // (ab,c)=3 — proving the apply ran before the second selection
    assert(got(1) === ((1L, "c", "d", 4L)))
    // merges stay internally consistent: ranks are 0..n-1 dense
    assert(got.map(_._1) === got.indices.map(_.toLong))
  }
}
