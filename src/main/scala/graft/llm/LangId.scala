package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Character-trigram Naive-Bayes language identification — the real langid
  * the r11 verdict asked for in place of the stopword-ratio toy (which
  * survives as [[TextAnalysis.stopwordRatio]], a quality feature, not a
  * language claim).
  *
  * Model: per language, the seed corpus below (hand-written generic prose —
  * no external data, the container ships none) yields padded char-trigram
  * counts; the top [[TopK]] trigrams become add-one-smoothed log
  * probabilities, SCALED TO INTEGERS at build time
  * (round(1000·ln((cnt+1)/(total+V)))). Integer weights are the
  * cross-engine contract: a document's score per language is a pure integer
  * sum (matched trigram weights + unmatched·default), so the DuckDB oracle
  * restates scoring EXACTLY from the same literals ([[profileSqlValues]] /
  * [[defaultsSqlValues]] are generated from the same map the expression
  * evaluates) — no transcendental functions evaluated at query time on
  * either engine. Prediction = argmax score, ties to the alphabetically
  * first language ([[Langs]] is sorted; first-max index = that tie-break).
  *
  * 100 TB shape: a per-row projection — one generated-code pass per
  * document over its padded characters with O(1) hash lookups per trigram
  * ([[graft.functions.LangIdScoresExpr]]); no shuffle, no UDF, composes
  * with any downstream filter. The readable HOF twin ([[scoresHof]]) is
  * pinned bit-identical by LangIdSpec.
  *
  * Scoring windows walk CODE POINTS end-to-end (native expression, HOF
  * twin, oracle substr) — an emoji or any supplementary character is one
  * window position in all three. */
object LangId {

  /** Sorted — the tie-break and the argmax index mapping depend on it. */
  val Langs: Seq[String] = Seq("de", "en", "es", "fr")

  val TopK = 128
  val Scale = 1000
  /** Smoothing vocabulary constant (≈ plausible distinct-trigram count). */
  val SmoothV = 4096

  /** Hand-written seed prose per language (original text, generic register —
    * enough mass that the top trigrams are the language's functional glue:
    * articles, inflections, frequent digraph boundaries). */
  private[llm] val Seeds: Map[String, String] = Map(
    "en" ->
      """The weather this morning was clear and cold, and the streets were
        |quiet before the shops opened. She walked along the river with her
        |coffee and watched the light change on the water. There is something
        |about the first hour of the day that makes everything seem possible.
        |The train arrived on time, which surprised everyone who had waited
        |through the long delays of the previous week. He said that the new
        |schedule would help, but nobody believed it until they saw the
        |results for themselves. In the evening the family gathered for
        |dinner and talked about the small things that had happened during
        |the day, the letters that arrived, the neighbors and their garden,
        |and the plans for the coming holiday by the sea.""".stripMargin,
    "de" ->
      """Das Wetter war heute Morgen klar und kalt, und die Straßen waren
        |ruhig, bevor die Geschäfte öffneten. Sie ging mit ihrem Kaffee am
        |Fluss entlang und beobachtete, wie sich das Licht auf dem Wasser
        |veränderte. Es gibt etwas an der ersten Stunde des Tages, das alles
        |möglich erscheinen lässt. Der Zug kam pünktlich an, was alle
        |überraschte, die durch die langen Verspätungen der vergangenen Woche
        |gewartet hatten. Er sagte, dass der neue Fahrplan helfen würde, aber
        |niemand glaubte es, bis sie die Ergebnisse selbst sahen. Am Abend
        |versammelte sich die Familie zum Essen und sprach über die kleinen
        |Dinge des Tages, die Briefe, die Nachbarn und ihren Garten und die
        |Pläne für den kommenden Urlaub am Meer.""".stripMargin,
    "es" ->
      """El tiempo esta mañana era claro y frío, y las calles estaban
        |tranquilas antes de que abrieran las tiendas. Ella caminó junto al
        |río con su café y observó cómo cambiaba la luz sobre el agua. Hay
        |algo en la primera hora del día que hace que todo parezca posible.
        |El tren llegó a tiempo, lo que sorprendió a todos los que habían
        |esperado durante los largos retrasos de la semana pasada. Dijo que
        |el nuevo horario ayudaría, pero nadie lo creyó hasta que vieron los
        |resultados por sí mismos. Por la tarde la familia se reunió para
        |cenar y habló de las pequeñas cosas que habían pasado durante el
        |día, de las cartas que llegaron, de los vecinos y su jardín y de
        |los planes para las próximas vacaciones junto al mar.""".stripMargin,
    "fr" ->
      """Le temps ce matin était clair et froid, et les rues étaient calmes
        |avant l'ouverture des magasins. Elle a marché le long de la rivière
        |avec son café et a regardé la lumière changer sur l'eau. Il y a
        |quelque chose dans la première heure du jour qui rend tout possible.
        |Le train est arrivé à l'heure, ce qui a surpris tous ceux qui
        |avaient attendu pendant les longs retards de la semaine précédente.
        |Il a dit que le nouvel horaire aiderait, mais personne ne l'a cru
        |avant de voir les résultats par eux-mêmes. Le soir, la famille s'est
        |réunie pour dîner et a parlé des petites choses de la journée, des
        |lettres arrivées, des voisins et de leur jardin et des projets pour
        |les prochaines vacances au bord de la mer.""".stripMargin)

  // Locale.ROOT: the default-locale toLowerCase would build a DIFFERENT
  // profile on e.g. a tr-TR JVM ('I' → dotless 'ı'), breaking both build
  // determinism and the match against Spark's locale-independent lower()
  private def normalizeStr(s: String): String =
    s.trim.toLowerCase(java.util.Locale.ROOT).replaceAll("\\s+", " ")

  /** Padded char trigrams — the same " text "-windowing the scoring
    * expression and the oracle apply. */
  private[llm] def trigramsOf(s: String): Seq[String] = {
    val p = " " + normalizeStr(s) + " "
    if (p.length < 3) Seq.empty
    else (0 to p.length - 3).map(i => p.substring(i, i + 3))
  }

  /** lang → (trigram → integer weight): top-K trigrams by (count desc,
    * trigram asc — a total order, so the profile is build-deterministic),
    * weight = round(Scale·ln((cnt+1)/(total+V))). */
  lazy val profile: Map[String, Map[String, Long]] = Seeds.map {
    case (lang, seed) =>
      val tris = trigramsOf(seed)
      val total = tris.size.toDouble
      val counts = tris.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val top = counts.toSeq.sortBy { case (t, c) => (-c, t) }.take(TopK)
      lang -> top.map { case (t, c) =>
        t -> math.round(Scale * math.log((c + 1.0) / (total + SmoothV)))
      }.toMap
  }

  /** lang → weight of a trigram absent from the profile (the smoothing
    * floor, same formula at count 0). */
  lazy val defaults: Map[String, Long] = Seeds.map { case (lang, seed) =>
    lang -> math.round(
      Scale * math.log(1.0 / (trigramsOf(seed).size + SmoothV)))
  }

  /** The padded scoring input: " " + normalize(text) + " ". */
  def padded(text: Column): Column =
    concat(lit(" "), TextAnalysis.normalize(text), lit(" "))

  /** Per-language integer scores (array in [[Langs]] order) — native
    * generated-code pass. */
  def scores(paddedText: Column): Column =
    graft.functions.LangIdScoresExpr.scores(paddedText)

  /** Readable HOF twin of [[scores]]: interpreted trigram transform + one
    * fold per language over literal-map lookups. Pinned bit-identical by
    * LangIdSpec; production paths use [[scores]]. */
  def scoresHof(paddedText: Column): Column = {
    val tris = when(length(paddedText) >= 3,
      transform(sequence(lit(1), length(paddedText) - 2),
        i => paddedText.substr(i, lit(3))))
      .otherwise(array())
    array(Langs.map { l =>
      val w = typedLit(profile(l))
      aggregate(tris, lit(0L),
        (acc, t) => acc + coalesce(element_at(w, t), lit(defaults(l))))
    }: _*)
  }

  /** Predicted language: argmax of [[scores]], ties to the first (sorted)
    * language — array_position finds the FIRST maximum. */
  def predict(scoresCol: Column): Column =
    element_at(typedLit(Langs),
      array_position(scoresCol, array_max(scoresCol)).cast("int"))

  private def sqlQuote(s: String): String = "'" + s.replace("'", "''") + "'"

  /** `(lang, tri, w)` VALUES rows for the oracle — generated from the SAME
    * profile map the expression scores with, so the two engines cannot
    * drift. */
  lazy val profileSqlValues: String =
    Langs.flatMap(l => profile(l).toSeq.sortBy(_._1).map { case (t, w) =>
      s"(${sqlQuote(l)}, ${sqlQuote(t)}, $w)"
    }).mkString(",\n")

  /** `(lang, w0)` VALUES rows for the unmatched-trigram defaults. */
  lazy val defaultsSqlValues: String =
    Langs.map(l => s"(${sqlQuote(l)}, ${defaults(l)})").mkString(", ")
}
