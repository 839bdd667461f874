package graft.llm

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-15 curation operators: DSIR importance weights, the
  * corpus-trained trigram LM, and exact substring (span) duplication —
  * native-expression hash parity against Scala brutes, separation/edge
  * fixtures, and the plan-shape claims. */
class CurationSpec extends SparkSpec {

  private def ph(s: String): Long = {
    val B = graft.functions.WinnowFingerprintExpr.B
    val P = graft.functions.WinnowFingerprintExpr.P
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * B + cp) % P
      i += Character.charCount(cp)
    }
    h
  }

  // ---- hashed bigram buckets ----

  test("hashed bigram buckets match the poly-hash brute, incl. edges") {
    val s = spark
    import s.implicits._
    val texts = Seq("a b c", "one", "", "x  y", "über maß straße",
      "汉字 漢字 かな", "a b a b", "tok1\ntok2 tok3")
    val got = texts.toDF("text")
      .select(col("text"), Dsir.bucketIds(col("text")).as("bks"))
      .collect()
    got.foreach { r =>
      val toks = r.getString(0).replace('\n', ' ').split(" ", -1)
        .filter(_.nonEmpty)
      val expected =
        if (toks.length < 2) Seq.empty[Int]
        else toks.sliding(2).map(p =>
          (ph(p.mkString(" ")) % Dsir.NBuckets).toInt).toSeq
      assert(r.getSeq[Int](1) === expected, s"text '${r.getString(0)}'")
    }
  }

  // ---- DSIR weights ----

  test("DSIR separates target-like docs on a handcrafted corpus") {
    val s = spark
    import s.implicits._
    // target vocabulary: 'alpha beta gamma'; off-target: 'zig zag zog'
    val docs = (
      (1L to 8L).map(i => (i, "t", "alpha beta gamma alpha beta gamma")) ++
      (9L to 16L).map(i => (i, "r", "zig zag zog zig zag zog")) ++
      Seq((17L, "r", "alpha beta gamma alpha beta"))
    ).toDF("doc_id", "kind", "text")
    val target = docs.filter(col("kind") === "t")
    val rows = Dsir.withWeights(docs, target, col("text"))
      .select(col("doc_id"), col("kind"), col("dsir_w")).collect()
    val tW = rows.filter(_.getString(1) == "t").map(_.getLong(2))
    val offW = rows.filter(r => r.getString(1) == "r" && r.getLong(0) <= 16L)
      .map(_.getLong(2))
    val planted = rows.find(_.getLong(0) == 17L).get.getLong(2)
    assert(tW.min > offW.max,
      s"target docs must outweigh off-target: ${tW.min} vs ${offW.max}")
    assert(planted > offW.max,
      "the target-looking raw doc must outweigh the off-target docs")
  }

  test("DSIR weight of a windowless doc is 0; weights are finite integers") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "alpha beta"), (2L, "solo"), (3L, ""),
      (4L, "zig zag zig zag")).toDF("doc_id", "text")
    val rows = Dsir.withWeights(docs, docs.filter(col("doc_id") === 1L),
        col("text"))
      .select(col("doc_id"), col("dsir_w")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows(2L) === 0L) // one token → no bigrams
    assert(rows(3L) === 0L) // empty
    assert(rows(1L) > 0L)   // the target's own bigram is target-enriched
    assert(rows(4L) < 0L)   // off-target bigrams are raw-enriched
  }

  // ---- trained trigram LM ----

  test("trained LM scores in-distribution text below noise") {
    val s = spark
    import s.implicits._
    val corpus = (1L to 20L)
      .map(i => (i, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val model = LmTrain.trainModel(corpus, col("text"))
    val probe = Seq((1L, "the quick brown fox"), (2L, "qqq zzz xxx vvv"))
      .toDF("doc_id", "text")
    val scored = LmTrain.withTrainedNll(probe, col("text"),
        LmTrain.collectModel(model))
      .select(col("doc_id"), col("lm_t_mw")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(scored(1L) < scored(2L),
      s"fluent ${scored(1L)} must score under noise ${scored(2L)}")
    // noise saturates at the unseen floor
    assert(scored(2L) === LmScore.UnseenCost)
  }

  test("trained LM matches a single-JVM brute on a tiny corpus") {
    val s = spark
    import s.implicits._
    val texts = Seq("ab ba ab", "ba ab ab ba", "ab ab")
    val corpus = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    // brute: padded trigram/bigram counts + the cost formula
    def pad(t: String) = " " + t.trim.toLowerCase.replaceAll("\\s+", " ") + " "
    val tri = scala.collection.mutable.HashMap.empty[String, Long]
    val big = scala.collection.mutable.HashMap.empty[String, Long]
    texts.map(pad).foreach { p =>
      (0 to p.length - 3).foreach(i =>
        tri.update(p.substring(i, i + 3), tri.getOrElse(p.substring(i, i + 3), 0L) + 1))
      (0 to p.length - 2).foreach(i =>
        big.update(p.substring(i, i + 2), big.getOrElse(p.substring(i, i + 2), 0L) + 1))
    }
    val expCosts = tri.map { case (t, c) =>
      t -> -math.round(LmTrain.Scale *
        math.log((c + 1.0) / (big(t.substring(0, 2)) + LmTrain.SmoothV)) + 1e-9)
    }.toMap
    val gotModel = LmTrain.trainModel(corpus, col("text"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    gotModel.foreach { case (t, c, cost) =>
      assert(c === tri(t), s"count of '$t'")
      assert(cost === expCosts(t), s"cost of '$t'")
    }
    assert(gotModel.length === tri.size) // under TopM, nothing pruned
    // per-doc NLL: every window is in-model for doc 0
    val nll = LmTrain.withTrainedNll(corpus, col("text"),
        LmTrain.collectModel(LmTrain.trainModel(corpus, col("text"))))
      .select(col("doc_id"), col("nll_t")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val p0 = pad(texts(0))
    val exp0 = (0 to p0.length - 3)
      .map(i => expCosts(p0.substring(i, i + 3))).sum
    assert(nll(0L) === exp0)
  }

  test("trained-LM model cut is deterministic and capped at TopM") {
    val m = LmTrain.trainModel(
      graft.model.Tables.documents(spark, Sf), col("text")).collect()
    assert(m.length <= LmTrain.TopM)
    assert(m.map(_.getString(0)).distinct.length === m.length)
  }

  // ---- span dedup ----

  test("token window hashes match the brute, empty under W tokens") {
    val s = spark
    import s.implicits._
    val texts = Seq(
      "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10",
      "a b c d e f g",            // 7 tokens < W=8 → empty
      "x  y z q r s t u v",       // whitespace run filtered first
      "汉 字 一 二 三 四 五 六 七")
    val got = texts.toDF("text")
      .select(col("text"),
        graft.functions.TokenWindowHashesExpr.hashes(
          TextAnalysis.flatTokens(col("text")), SpanDedup.W).as("hs"))
      .collect()
    got.foreach { r =>
      val toks = r.getString(0).split(" ", -1).filter(_.nonEmpty)
      val expected =
        if (toks.length < SpanDedup.W) Seq.empty[Long]
        else toks.sliding(SpanDedup.W).map(w => ph(w.mkString(" "))).toSeq
      assert(r.getSeq[Long](1) === expected, s"text '${r.getString(0)}'")
    }
  }

  test("span report flags exactly the cross-doc shared windows") {
    val s = spark
    import s.implicits._
    val shared10 = "s1 s2 s3 s4 s5 s6 s7 s8 s9 s10" // 10 tokens → 3 windows
    val docs = Seq(
      (1L, shared10 + " a1 a2 a3 a4 a5 a6 a7 a8"),
      (2L, "b1 b2 b3 b4 b5 b6 b7 b8 " + shared10),
      (3L, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10 c11 c12")).toDF("doc_id", "text")
    val rows = SpanDedup.report(docs, col("doc_id"), col("text"))
      .orderBy(col("doc_id")).collect()
    val byId = rows.map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2)))).toMap
    // doc1: 18 tokens → 11 windows; shared windows = the 3 fully inside
    // the shared run
    assert(byId(1L) === ((11L, 3L)))
    assert(byId(2L) === ((11L, 3L)))
    assert(byId(3L) === ((5L, 0L)))
  }

  // ---- html strip ----

  test("robotsNoindex: both attr orders, case, quoting, token and agent bounds") {
    val s = spark
    import s.implicits._
    def blocked(h: String, agent: String = "robots"): Boolean =
      Seq(h).toDF("h").select(Html.robotsNoindex(col("h"), agent).as("v"))
        .collect()(0).getBoolean(0)
    assert(blocked("""<meta name="robots" content="noindex, follow">"""))
    assert(blocked("""<META NAME="ROBOTS" CONTENT="NOINDEX">"""))
    assert(blocked("""<meta content='none' name=robots>"""))
    assert(blocked("""<meta name='robots' content='nofollow, noindex'>"""))
    // content token bound: nofollow alone, or 'noindexing' as a longer
    // word, must NOT block
    assert(!blocked("""<meta name="robots" content="nofollow">"""))
    assert(!blocked("""<meta name="robots" content="noindexing">"""))
    // a page that merely MENTIONS noindex in prose stays indexable
    assert(!blocked("<p>set robots to noindex to hide a page</p>"))
    // agent bound: another crawler's directive is not ours...
    assert(!blocked("""<meta name="googlebot" content="noindex">"""))
    // ...unless the pipeline asks for that agent
    assert(blocked("""<meta name="googlebot" content="noindex">""",
      agent = "googlebot"))
    assert(!blocked("""<meta name="robots" content="index, follow">"""))
    assert(!blocked("plain text, no markup"))
    // agent name is bounded on BOTH sides (r18 advice): a LONGER name
    // sharing our prefix is a different agent — blocking on it would
    // over-block pages that opted out someone else
    assert(!blocked("""<meta name="robotsxyz" content="noindex">"""))
    assert(!blocked("""<meta name="googlebot-news" content="noindex">""",
      agent = "googlebot"))
    // tag bound (r19 advice): a bare name-only meta tag followed by BODY
    // text that happens to contain content="noindex before the next '>'
    // must not match across the tag close
    assert(!blocked(
      """<meta name=robots>stray prose content="noindex none" trap<p>x</p>"""))
    // ...while the legit unquoted name-first form still blocks
    assert(blocked("""<meta name=robots content="noindex">"""))
    // a metacharacter-bearing agent is rejected loudly, not misparsed
    intercept[IllegalArgumentException](Html.robotsPatterns("ro.bots"))
  }

  test("robotsHeaderNoindex: X-Robots-Tag scoping, token bound, null safety") {
    val s = spark
    import s.implicits._
    def blocked(h: String, agent: String = "robots"): Boolean =
      Seq(Option(h)).toDF("h")
        .select(Html.robotsHeaderNoindex(col("h"), agent).as("v"))
        .collect()(0).getBoolean(0)
    // unscoped directives apply to every agent
    assert(blocked("noindex"))
    assert(blocked("noindex, nofollow"))
    assert(blocked("NONE"))
    assert(blocked("nofollow, noindex"))
    // our-agent scope
    assert(blocked("robots: noindex"))
    assert(blocked("googlebot: nofollow, noindex", agent = "googlebot"))
    // ANOTHER agent's scope must not fire ours (the colon bound)
    assert(!blocked("googlebot: noindex"))
    assert(!blocked("googlebot-news: noindex", agent = "googlebot"))
    // token bound: nofollow/noindexing are not opt-outs
    assert(!blocked("nofollow"))
    assert(!blocked("noindexing"))
    // colon-bearing VALUE directives before the token (r19 advice): the
    // directive walk crosses unavailable_after/max-* values, scoped or not
    assert(blocked("unavailable_after: 25 Jun 2026, noindex"))
    assert(blocked("robots: unavailable_after: 25 Jun 2026, noindex"))
    assert(blocked("max-snippet: -1, noindex"))
    assert(blocked("noarchive, max-image-preview: large, none"))
    // ...but an unknown word: is another agent's scope, not a value
    assert(!blocked("googlebot: unavailable_after: 25 Jun 2026, noindex"))
    // null header keeps the page (coalesce arm)
    assert(!blocked(null))
    intercept[IllegalArgumentException](Html.robotsHeaderPattern("a|b"))
  }

  test("htmlToText: blocks dropped, tags stripped, entities decoded in order") {
    val s = spark
    import s.implicits._
    def clean(h: String): String =
      Seq(h).toDF("h").select(Html.toText(col("h")).as("v"))
        .collect()(0).getString(0)
    assert(clean("<html><body><h1>A</h1><p>b c</p></body></html>") === "A b c")
    // script payload with < > && and quotes must vanish entirely
    assert(clean("x<script>if (a < 2 && b > 1) { alert(\"q\"); }</script>y")
      === "x y")
    assert(clean("a<style>p { color: red }</style>b") === "a b")
    assert(clean("a<!-- multi\nline\ncomment -->b") === "a b")
    // entity order: &amp;lt; decodes to &lt; (literal), NOT to <
    assert(clean("&amp;lt; &lt; &gt; &quot; &#39; &nbsp;") ===
      "&lt; < > \" '")
    // clean text is a fixed point
    val plain = "no markup here just words"
    assert(clean(plain) === plain)
    // unterminated tag: the [^>]+ tag regex never eats past a close
    assert(clean("a <b>bold</b> c") === "a bold c")
  }

  // ---- bm25 ----

  test("bm25: term-bearing docs rank above term-free docs; tf saturates") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "spark spark spark spark filler filler"),
      (2L, "spark filler filler filler filler filler"),
      (3L, "filler words only here none match this"),
      (4L, "spark query filler filler filler filler")).toDF("doc_id", "text")
    val scored = Retrieval.withBm25(docs, col("text"), Seq("spark", "query"))
      .select(col("doc_id"), col("bm25")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scored(3L) === 0.0)
    assert(scored(2L) > 0.0)
    assert(scored(1L) > scored(2L), "higher tf scores higher")
    assert(scored(4L) > scored(2L), "two matched terms beat one")
    // saturation: 4x the tf is far less than 4x the score
    assert(scored(1L) < scored(2L) * 4.0)
    val top = Retrieval.topK(docs, col("text"), col("doc_id"),
      Seq("spark", "query"), k = 2).select(col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    assert(!top.contains(3L))
  }

  // ---- cluster-balanced sampling ----

  test("cluster-balanced sample: per-cell cap, corpus subset, deterministic") {
    val emb = graft.model.Tables.embeddings(spark, Sf)
    val cent = emb.filter(col("vec_id") % 101 === 0)
    val got = Sampling.clusterBalanced(emb, cent, k = 10)
      .collect().map(r => (r.getAs[Long]("cell"), r.getAs[Long]("vec_id")))
    val perCell = got.groupBy(_._1).view.mapValues(_.length)
    assert(perCell.values.forall(_ <= 10), "no cell may exceed its quota")
    val corpusIds = emb.select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(got.forall(p => corpusIds.contains(p._2)))
    val cells = cent.select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(got.forall(p => cells.contains(p._1)))
    val again = Sampling.clusterBalanced(emb, cent, k = 10)
      .collect().map(r => (r.getAs[Long]("cell"), r.getAs[Long]("vec_id")))
    assert(got.sorted.toSeq === again.sorted.toSeq, "two runs must agree")
  }

  test("cluster-balanced sample keeps every member of an under-quota cell") {
    val s = spark
    import s.implicits._
    // two well-separated 2-d clusters: 3 members near (0,0), 12 near (9,9)
    val emb = (
      (1L to 3L).map(i => (i, Array(0.01f * i, 0.01f * i))) ++
      (11L to 22L).map(i => (i, Array(9.0f + 0.001f * i, 9.0f)))
    ).toDF("vec_id", "embedding")
    val cent = Seq((1L, Array(0.0f, 0.0f)), (11L, Array(9.0f, 9.0f)))
      .toDF("vec_id", "embedding")
    val got = Sampling.clusterBalanced(emb, cent, k = 5)
      .collect().map(r => (r.getAs[Long]("cell"), r.getAs[Long]("vec_id")))
    val byCell = got.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byCell(1L) === Set(1L, 2L, 3L), "under-quota cell keeps all")
    assert(byCell(11L).size === 5, "over-quota cell caps at k")
    assert(byCell(11L).subsetOf((11L to 22L).toSet))
  }

  test("span dedup apply: first occurrence kept, copies cut, under-W pass-through") {
    val s = spark
    import s.implicits._
    val shared10 = "s1 s2 s3 s4 s5 s6 s7 s8 s9 s10"
    val docs = Seq(
      (1L, shared10 + " a1 a2 a3 a4 a5 a6 a7 a8"),   // owner: untouched
      (2L, "b1 b2 b3 b4 b5 b6 b7 b8 " + shared10),   // copier: loses the copy
      (3L, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10 c11 c12"), // distinct: untouched
      (4L, "d1 d2 d3"),                               // under W: pass-through
      (5L, "x1 x2 x3 x4 x5 x6 x7 x8 x1 x2 x3 x4 x5 x6 x7 x8") // self-dup
    ).toDF("doc_id", "text")
    val got = SpanDedup.dedupApply(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) === ((18L, 18L,
      shared10 + " a1 a2 a3 a4 a5 a6 a7 a8")))
    assert(got(2L) === ((18L, 8L, "b1 b2 b3 b4 b5 b6 b7 b8")))
    assert(got(3L) === ((12L, 12L,
      "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10 c11 c12")))
    assert(got(4L) === ((3L, 3L, "d1 d2 d3")))
    assert(got(5L) === ((16L, 8L, "x1 x2 x3 x4 x5 x6 x7 x8")),
      "within-doc repetition keeps only the first occurrence")
  }

  test("span dedup apply: a forced 31-bit collision never cuts innocent text") {
    val s = spark
    import s.implicits._
    // Two DISTINCT 8-token windows whose 31-bit poly hashes collide
    // (birthday search over random last tokens, seed 17) — single-hash
    // keying would flag windowB as a duplicate of windowA and cut all of
    // doc 2. The independent 41-bit hash splits them.
    val winA = "alpha beta gamma delta epsilon zeta eta pgnudtil"
    val winB = "alpha beta gamma delta epsilon zeta eta nqwhycux"
    assert(ph(winA) === ph(winB), "fixture drift: 31-bit hashes must collide")
    def ph2(str: String): Long = {
      val B2 = graft.functions.TokenWindowHashesExpr.B2
      val P2 = graft.functions.TokenWindowHashesExpr.P2
      var h = 0L; var i = 0
      while (i < str.length) {
        val cp = str.codePointAt(i)
        h = (h * B2 + cp) % P2
        i += Character.charCount(cp)
      }
      h
    }
    assert(ph2(winA) !== ph2(winB), "second hashes must differ")
    // engine parity for the second hash (same brute, B2/P2 constants)
    val h2s = Seq(winA, winB).toDF("text")
      .select(graft.functions.TokenWindowHashesExpr.hashes2(
        TextAnalysis.flatTokens(col("text")), SpanDedup.W).as("hs"))
      .collect().map(_.getSeq[Long](0).head)
    assert(h2s.toSeq === Seq(ph2(winA), ph2(winB)))
    // doc 3 is a TRUE copy of windowA: it must still be cut in full
    val docs = Seq((1L, winA), (2L, winB), (3L, winA)).toDF("doc_id", "text")
    val got = SpanDedup.dedupApply(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) === ((8L, 8L, winA)), "owner keeps its text")
    assert(got(2L) === ((8L, 8L, winB)),
      "the colliding-but-distinct window must survive un-cut")
    assert(got(3L) === ((8L, 0L, "")), "the real duplicate is still cut")
    // the report sees exactly one shared pair (winA x2), not the collision
    val rep = SpanDedup.report(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(rep === Map(1L -> 1L, 2L -> 0L, 3L -> 1L))
  }

  test("span dedup apply on an all-distinct corpus is the identity") {
    val s = spark
    import s.implicits._
    val docs = (1L to 5L).map(i =>
      (i, (1 to 12).map(j => s"w${i}_$j").mkString(" "))).toDF("doc_id", "text")
    val got = SpanDedup.dedupApply(docs, col("doc_id"), col("text"))
      .collect()
    assert(got.forall(r => r.getLong(1) === r.getLong(2)))
    val texts = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    got.foreach(r => assert(r.getString(3) === texts(r.getLong(0))))
  }

  test("span report on an all-distinct corpus is all-zero dup") {
    val s = spark
    import s.implicits._
    val docs = (1L to 6L).map(i =>
      (i, (1 to 12).map(j => s"w${i}_$j").mkString(" "))).toDF("doc_id", "text")
    val rows = SpanDedup.report(docs, col("doc_id"), col("text")).collect()
    assert(rows.length === 6)
    assert(rows.forall(_.getLong(2) === 0L))
    assert(rows.forall(_.getDouble(3) === 0.0))
  }
}
