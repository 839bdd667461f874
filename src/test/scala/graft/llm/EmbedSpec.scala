package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Engine-native hashed-bigram embedder: native expression vs a Scala
  * brute (hash contract + slot counts), edge shapes, and the end-to-end
  * text→embed→SemDeDup drop of an exact-copy plant. */
class EmbedSpec extends SparkSpec {

  private def brute(text: String, dim: Int): Seq[Long] = {
    val B = graft.functions.WinnowFingerprintExpr.B
    val P = graft.functions.WinnowFingerprintExpr.P
    def ph(s: String): Long = {
      var h = 0L; var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        h = (h * B + cp) % P
        i += Character.charCount(cp)
      }
      h
    }
    val toks = text.replace('\n', ' ').split(" ", -1).filter(_.nonEmpty)
    val v = new Array[Long](dim)
    toks.sliding(2).filter(_.length == 2).foreach { p =>
      v((ph(p.mkString(" ")) % dim).toInt) += 1L
    }
    v.toSeq
  }

  test("hashed embedding matches the brute, incl. edges and unicode") {
    val s = spark
    import s.implicits._
    val texts = Seq(
      "a b c d e",
      "one",                    // single token -> zero vector
      "",                       // empty -> zero vector
      "x  y\nz",                // whitespace runs + newline tokenization
      "über maß straße über maß", // repeated bigram counts twice
      "汉字 漢字 かな 汉字 漢字")
    val dim = Embed.Dim
    val got = texts.toDF("text")
      .select(col("text"), Embed.hashedEmbedding(col("text")).as("v"))
      .collect()
    got.foreach { r =>
      assert(r.getSeq[Long](1) === brute(r.getString(0), dim),
        s"text '${r.getString(0)}'")
    }
    // total mass = bigram count
    got.foreach { r =>
      val toks = r.getString(0).replace('\n', ' ')
        .split(" ", -1).count(_.nonEmpty)
      assert(r.getSeq[Long](1).sum === math.max(0, toks - 1).toLong)
    }
    // direct (unfiltered) callers: empty tokens break the pair chain —
    // ["a", "", "b"] hashes NO grams, never phantom "a "/" b" pairs
    val raw = Seq("a  b").toDF("text")
      .select(graft.functions.HashedEmbeddingExpr.embed(
        split(col("text"), " "), dim).as("v"))
      .collect()(0).getSeq[Long](0)
    assert(raw.sum === 0L, "empty token must not form grams with neighbors")
  }

  test("text -> embed -> semdedup drops exactly the planted exact copies") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(17)
    val base = (1L to 40L).map(i =>
      (i, (0 until 30).map(_ => s"w${rnd.nextInt(997)}").mkString(" ")))
    val plants = base.filter(_._1 % 5 == 0).map { case (i, t) => (i + 900L, t) }
    val docs = (base ++ plants).toDF("vec_id", "text")
    val emb = docs.select(col("vec_id"),
      Embed.hashedEmbedding(col("text")).as("embedding"))
    val survivors = Similarity.semDeDupSurvivors(emb,
        centroids = emb.filter(col("vec_id") % 7 === 1),
        tau = 0.999, nBits = 0)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    // every plant (exact text copy => identical vector, cosine 1) drops;
    // plants are the HIGHER ids so the originals all survive
    plants.foreach { case (id, _) =>
      assert(!survivors.contains(id), s"plant $id must drop")
    }
    assert(base.map(_._1).toSet.subsetOf(survivors),
      "base docs must survive (distinct token streams)")
    // the production hot-cell guard (nBits>0) only SPLITS cells → pairs
    // shrink → survivors can only widen; exact copies share every
    // hyperplane sign, so the plants stay dropped
    val guarded = Similarity.semDeDupSurvivors(emb,
        centroids = emb.filter(col("vec_id") % 7 === 1),
        tau = 0.999, nBits = 12)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(survivors.subsetOf(guarded), "nBits>0 never drops more")
    plants.foreach { case (id, _) =>
      assert(!guarded.contains(id), s"plant $id must drop under the guard")
    }
    // the anchorCap production guard (r17 verdict #3): a capped loser needs
    // a lower-id witness the uncapped form also sees (an identical-nv
    // partner, or an in-cell anchor) → survivors can only widen ...
    val capped = Similarity.semDeDupSurvivors(emb,
        centroids = emb.filter(col("vec_id") % 7 === 1),
        tau = 0.999, nBits = 0, anchorCap = 3)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(survivors.subsetOf(capped), "anchorCap never drops more")
    // ... while the EXACT-collapse stage keys on the unit vector itself,
    // so the planted exact copies drop at ANY cell size, cap-independent
    plants.foreach { case (id, _) =>
      assert(!capped.contains(id), s"plant $id must drop under anchorCap")
    }
    // and when every cell fits under the cap, every cell member is an
    // anchor — the capped form IS the paper's form
    val cappedWide = Similarity.semDeDupSurvivors(emb,
        centroids = emb.filter(col("vec_id") % 7 === 1),
        tau = 0.999, nBits = 0, anchorCap = 1000)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(cappedWide === survivors,
      "cap above the largest cell must reproduce the uncapped survivors")
  }
}
