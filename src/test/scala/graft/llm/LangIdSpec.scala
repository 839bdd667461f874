package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Char-trigram Naive-Bayes language ID: profile build determinism, native
  * ≡ HOF scoring, and correct predictions on multilingual fixtures that
  * share NO sentences with the seed prose. */
class LangIdSpec extends SparkSpec {

  // held-out sentences, deliberately different register from the seeds
  private val fixtures = Seq(
    ("en", "the children played in the park until it started to rain and they ran home laughing"),
    ("en", "please remember to bring your passport and the tickets when you leave for the airport"),
    ("de", "die Kinder spielten im Park, bis es zu regnen begann, und sie liefen lachend nach Hause"),
    ("de", "bitte denken Sie daran, Ihren Reisepass und die Fahrkarten mitzubringen, wenn Sie zum Flughafen fahren"),
    ("es", "los niños jugaban en el parque hasta que empezó a llover y corrieron a casa riendo"),
    ("es", "por favor recuerda traer tu pasaporte y los billetes cuando salgas hacia el aeropuerto"),
    ("fr", "les enfants jouaient dans le parc jusqu'à ce qu'il commence à pleuvoir et ils ont couru à la maison en riant"),
    ("fr", "n'oubliez pas d'apporter votre passeport et les billets quand vous partez pour l'aéroport"),
    ("it", "i bambini giocavano nel parco finché non ha cominciato a piovere e sono corsi a casa ridendo"),
    ("it", "per favore ricordati di portare il passaporto e i biglietti quando parti per l'aeroporto"),
    ("pt", "as crianças brincavam no parque até começar a chover e correram para casa a rir"),
    ("pt", "por favor lembra-te de trazer o teu passaporte e os bilhetes quando saíres para o aeroporto"),
    ("ru", "дети играли в парке, пока не начался дождь, и они со смехом побежали домой"),
    ("ru", "пожалуйста, не забудьте взять паспорт и билеты, когда поедете в аэропорт"),
    ("ar", "لعب الأطفال في الحديقة حتى بدأ المطر فركضوا إلى البيت وهم يضحكون"),
    ("ar", "من فضلك تذكر أن تحضر جواز سفرك والتذاكر عندما تغادر إلى المطار"),
    ("ja", "子どもたちは雨が降り始めるまで公園で遊び、笑いながら家へ走って帰った"),
    ("ja", "空港へ出発するときは、パスポートと切符を忘れずに持ってきてください"),
    ("zh", "孩子们在公园里玩耍，直到开始下雨，他们笑着跑回家"),
    ("zh", "请记得在出发去机场的时候带上你的护照和票"))

  test("profile is deterministic, bounded, and shaped for the oracle") {
    assert(LangId.Langs === LangId.Langs.sorted)
    LangId.Langs.foreach { l =>
      val p = LangId.profile(l)
      // bounded by the cap; large enough to cover held-out prose (the
      // 128-cap regression: CJK profiles truncated to the alphabetically
      // low tail and matched nothing)
      assert(p.size <= LangId.TopK, s"$l profile size ${p.size}")
      assert(p.size >= 300, s"$l profile too small: ${p.size}")
      // code-point length: CJK trigrams are 3 chars but >3 UTF-16 units
      assert(p.keys.forall(t => t.codePointCount(0, t.length) === 3))
      // boosts: strictly positive (a seen trigram always beats the unseen
      // floor by ≥ ~Scale·ln 2)
      assert(p.values.forall(_ >= 690L))
    }
    // the SQL literal block carries every weight exactly once
    assert(LangId.profileSqlValues.linesIterator.size ===
      LangId.Langs.map(LangId.profile(_).size).sum)
  }

  test("multilingual fixtures predict their language (held-out sentences)") {
    val s = spark
    import s.implicits._
    val df = fixtures.toDF("lang", "text")
      .select(col("lang"), col("text"),
        LangId.scores(LangId.padded(col("text"))).as("sc"))
      .select(col("lang"), LangId.predict(col("sc")).as("pred"))
    val got = df.collect().map(r => (r.getString(0), r.getString(1)))
    got.foreach { case (expected, pred) =>
      assert(pred === expected, s"misclassified a $expected sentence as $pred")
    }
  }

  test("native scoring is bit-identical to the HOF twin") {
    val s = spark
    import s.implicits._
    val docs = fixtures.map(_._2).toDF("text")
      .unionAll(graft.model.Tables.documents(spark, Sf)
        .select(col("text")).limit(50))
      .unionAll(Seq("", " ", "ab", "a  b").toDF("text")) // degenerate pads
      // non-BMP: every surrogate pair must be ONE window position in both
      // shapes (the UTF-16-unit walk diverged by k·default per emoji)
      .unionAll(Seq("good morning 😀 friends",
        "😀🚀🎉").toDF("text"))
    val both = docs.select(
      LangId.scores(LangId.padded(col("text"))).as("native"),
      LangId.scoresHof(LangId.padded(col("text"))).as("hof"))
    assert(both.filter(not(col("native") <=> col("hof"))).count() === 0L)
  }

  test("margin bins noise as 'und' and keeps real language above threshold") {
    val s = spark
    import s.implicits._
    // noise: no script signal — only smoothing-default differences separate
    // the languages, far under MarginPerWindow per window
    val noise = Seq("3 14 159 26 53 58 97 93 23 84 62 64 33 83 27 95",
      "x9 q7 zz k2 v5 w8 j3 p0 b6 n4 m1 t7 r2")
    val real = fixtures.map(_._2)
    val df = (noise.map(("und", _)) ++ fixtures).toDF("expected", "text")
      .withColumn("pad", LangId.padded(col("text")))
      .withColumn("sc", LangId.scores(col("pad")))
      .select(col("expected"),
        LangId.predictWithUnknown(col("sc"), col("pad")).as("pred"))
    df.collect().foreach { r =>
      assert(r.getString(1) === r.getString(0),
        s"expected ${r.getString(0)} got ${r.getString(1)}")
    }
    // zero-window degenerate: empty text must bin as und, never a language
    val empty = Seq("").toDF("text")
      .withColumn("pad", LangId.padded(col("text")))
      .select(LangId.predictWithUnknown(
        LangId.scores(col("pad")), col("pad")).as("p"))
    assert(empty.head.getString(0) === "und")
    assert(real.nonEmpty) // fixtures drive the confident half above
  }

  test("prediction tie-break takes the alphabetically first language") {
    val s = spark
    import s.implicits._
    // a text of profile-absent trigrams scores every language at
    // nTri·default(lang); defaults differ per language, so force a REAL tie
    // by checking argmax semantics directly on a constant array
    val df = Seq(1).toDF("x")
      .select(LangId.predict(typedLit(Seq(5L, 7L, 7L, 3L))).as("p"))
    assert(df.head.getString(0) === LangId.Langs(1)) // first max wins
  }
}
