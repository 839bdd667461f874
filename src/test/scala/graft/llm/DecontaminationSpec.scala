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

  test("clean/fuzzyClean: no forced hint; AQE still broadcasts a small flagged set") {
    // r20 verdict #4 (the r12 dropNearDups precedent): the flagged set is
    // contamination-rate-proportional — on a heavily contaminated corpus it
    // is NOT bounded, so the anti-join must carry no broadcast hint; the
    // planner/AQE still broadcasts the usual-case small side at runtime.
    val (docs, bench) = fixture
    for (out <- Seq(
        Decontamination.clean(docs, col("doc_id"), col("text"),
          bench, col("bench_text"), n = 5, minHits = 2),
        Decontamination.fuzzyClean(docs, col("doc_id"), col("text"),
          bench, col("bench_text"), k = 24, w = 8, minHits = 2))) {
      // drive THIS QueryExecution to completion so AQE finalizes the
      // runtime join strategy in the SAME plan the assertion below reads —
      // a noop write would execute a separate QueryExecution and leave
      // out.queryExecution's plan un-executed (r21 ADVICE)
      out.queryExecution.toRdd.foreach(_ => ())
      // the flagged-side anti-join must be un-hinted (the benchmark
      // shingle/fingerprint set's broadcast — bounded by the benchmark
      // suite — is fine and stays, but it sits BELOW an aggregation, never
      // as a direct anti-join child)
      import org.apache.spark.sql.catalyst.plans.logical.{Join, ResolvedHint}
      import org.apache.spark.sql.catalyst.plans.LeftAnti
      val hintedAnti = out.queryExecution.analyzed.collect {
        case j: Join if j.joinType == LeftAnti &&
          j.children.exists(_.isInstanceOf[ResolvedHint]) => j
      }
      assert(hintedAnti.isEmpty,
        s"forced hint on an anti-join child:\n${hintedAnti.mkString("\n")}")
      assert(out.queryExecution.executedPlan.toString.linesIterator.exists(l =>
          l.contains("BroadcastHashJoin") && l.contains("LeftAnti")),
        "small flagged set not broadcast by the planner/AQE")
    }
  }

  test("fuzzy differential: edited leakage exact provably misses, winnow catches") {
    import spark.implicits._
    val benchLine =
      "the committee reviewed seventeen benchmark submissions during the " +
        "autumn evaluation cycle and published detailed results"
    // the edit family real leakage survives: case-fold + a comma splice —
    // every word-5-gram differs (tokens are case-sensitive), yet long
    // character runs are untouched after normalization
    val edited = (benchLine.take(60) + "," + benchLine.drop(60)).toUpperCase
    val docs = Seq(
      (1L, edited), // edited copy of the benchmark line
      (2L, "completely unrelated prose about gardening tools and weather")
    ).toDF("doc_id", "text")
    val bench = Seq(Tuple1(benchLine)).toDF("bench_text")
    // EXACT pass: zero shared shingles even at minHits = 1 — the miss
    val exact = Decontamination.contaminationHits(docs, col("doc_id"),
        col("text"), bench, col("bench_text"), n = 5, minHits = 1)
      .collect()
    assert(exact.isEmpty, "exact n-gram pass must miss the edited copy")
    // FUZZY pass: the unedited ≥ k+w−1 char runs still share fingerprints
    val fuzzy = Decontamination.fuzzyHits(docs, col("doc_id"), col("text"),
        bench, col("bench_text"), k = 24, w = 8, minHits = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(fuzzy.keySet === Set(1L), "fuzzy pass must flag ONLY the edited copy")
    assert(fuzzy(1L) >= 2L)
    // clean twin drops exactly the flagged doc
    val clean = Decontamination.fuzzyClean(docs, col("doc_id"), col("text"),
      bench, col("bench_text"), k = 24, w = 8, minHits = 2)
    assert(clean.select("doc_id").collect().map(_.getLong(0)).toSeq === Seq(2L))
  }

  test("fuzzy property: hits equal brute-force fingerprint intersection") {
    import spark.implicits._
    // reference winnow: rolling k-gram hash minima over w-wide windows,
    // shares no code with WinnowFingerprintExpr
    val B = 1000003L
    val P = 2147483647L
    def refFps(s: String, k: Int, w: Int): Set[Long] = {
      val nt = s.trim.toLowerCase.replaceAll("\\s+", " ")
      if (nt.length < k) Set.empty
      else {
        val g = (0 to nt.length - k).map { p =>
          nt.substring(p, p + k).foldLeft(0L)((h, c) => (h * B + c) % P)
        }
        (0 until math.max(g.length - w + 1, 1)).map { p =>
          g.slice(p, math.min(p + w, g.length)).min
        }.toSet
      }
    }
    val rnd = new scala.util.Random(2025)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    def text(): String =
      Seq.fill(rnd.nextInt(20) + 4)(vocab(rnd.nextInt(vocab.length)))
        .mkString(" ")
    for (round <- 1 to 3) {
      val docRows = (0 until 30).map(i => (i.toLong, text()))
      val benchRows = (0 until 5).map(_ => text())
      val k = 14
      val w = 6
      val benchSet = benchRows.flatMap(refFps(_, k, w)).toSet
      val expected = docRows
        .map { case (id, s) => id -> refFps(s, k, w).count(benchSet.contains).toLong }
        .filter(_._2 >= 3).toMap
      val got = Decontamination.fuzzyHits(
          docRows.toDF("doc_id", "text"), col("doc_id"), col("text"),
          benchRows.map(Tuple1(_)).toDF("bench_text"), col("bench_text"),
          k = k, w = w, minHits = 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expected, s"round=$round")
    }
  }
}
