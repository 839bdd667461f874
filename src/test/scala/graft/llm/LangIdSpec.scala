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
    ("fr", "n'oubliez pas d'apporter votre passeport et les billets quand vous partez pour l'aéroport"))

  test("profile is deterministic, bounded, and shaped for the oracle") {
    assert(LangId.Langs === LangId.Langs.sorted)
    LangId.Langs.foreach { l =>
      val p = LangId.profile(l)
      assert(p.size === LangId.TopK, s"$l profile size ${p.size}")
      assert(p.keys.forall(_.length === 3))
      assert(p.values.forall(_ < 0L)) // scaled log probs of <1 events
      assert(p.values.forall(_ > LangId.defaults(l))) // seen beats unseen
    }
    // the SQL literal block carries every weight exactly once
    assert(LangId.profileSqlValues.linesIterator.size ===
      LangId.Langs.size * LangId.TopK)
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
