package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Planted-leak semantics for the decontamination pass: a document wholly
  * containing a benchmark span is flagged, a single shared n-gram stays
  * under the threshold, short documents carry no n-gram at all, and the
  * clean pass removes exactly the flagged set. */
class DecontaminationSpec extends SparkSpec {

  private def fixture = {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"), // full leak
      (2L, "completely different words entirely unrelated content here now"),
      (3L, "the quick brown fox jumps high into orbit"), // one shared 5-gram
      (4L, "tiny") // shorter than n tokens: no shingle, never flagged
    ).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "xx the quick brown fox jumps over the lazy dog yy")
    ).toDF("bench_id", "bench_text")
    (docs, bench)
  }

  test("containment flags, single shared n-gram stays under threshold") {
    val (docs, bench) = fixture
    val hits = Decontamination.contaminationHits(docs, col("doc_id"),
        col("text"), bench, col("bench_text"), n = 5, minHits = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(hits.keySet === Set(1L))
    // doc 1's five 5-grams all occur inside the benchmark line
    assert(hits(1L) === 5L)
  }

  test("minHits = 1 also catches the single-gram overlap") {
    val (docs, bench) = fixture
    val hits = Decontamination.contaminationHits(docs, col("doc_id"),
        col("text"), bench, col("bench_text"), n = 5, minHits = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(hits === Map(1L -> 5L, 3L -> 1L))
  }

  test("property: hits equal brute-force shingle-set intersection (randomized)") {
    import spark.implicits._
    val rnd = new scala.util.Random(1711)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa")
    def text(): String =
      Seq.fill(rnd.nextInt(28) + 2)(vocab(rnd.nextInt(vocab.length)))
        .mkString(" ")
    for (n <- Seq(2, 3); round <- 1 to 3) {
      val docRows = (0 until 40).map(i => (i.toLong, text()))
      val benchRows = (0 until 6).map(_ => text())
      def grams(s: String): Set[String] = {
        val t = s.split(" ", -1)
        if (t.length < n) Set.empty
        else t.sliding(n).map(_.mkString(" ")).toSet
      }
      val benchSet = benchRows.flatMap(grams).toSet
      val expected = docRows
        .map { case (id, s) => id -> grams(s).count(benchSet.contains).toLong }
        .filter(_._2 >= 2).toMap
      val got = Decontamination.contaminationHits(
          docRows.toDF("doc_id", "text"), col("doc_id"), col("text"),
          benchRows.map(Tuple1(_)).toDF("bench_text"),
          col("bench_text"), n = n, minHits = 2)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expected, s"n=$n round=$round")
    }
  }

  test("clean removes exactly the flagged documents, schema preserved") {
    val (docs, bench) = fixture
    val clean = Decontamination.clean(docs, col("doc_id"), col("text"),
      bench, col("bench_text"), n = 5, minHits = 2)
    assert(clean.columns.toSeq === docs.columns.toSeq)
    assert(clean.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ===
      Seq(2L, 3L, 4L))
  }
}
