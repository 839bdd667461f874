package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Connected-component cluster resolution: chains, triangles, isolated pairs,
  * and diameter-bounded convergence. */
class DedupComponentsSpec extends SparkSpec {

  private def comp(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    Dedup.components(pairs.toDF("id_a", "id_b"), col("id_a"), col("id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chain, triangle, and isolated pair resolve to min-id survivors") {
    val got = comp(Seq(
      (1L, 2L), (2L, 3L),             // chain: A~B, B~C ⇒ one cluster
      (10L, 11L),                     // isolated pair
      (20L, 21L), (21L, 22L), (20L, 22L))) // triangle
    assert(got === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("long path converges (diameter > 2) and direction doesn't matter") {
    // path 7-6-5-4-3-2-1 written high→low: min label must walk the whole way
    val got = comp(Seq((7L, 6L), (6L, 5L), (5L, 4L), (4L, 3L), (3L, 2L), (2L, 1L)))
    assert(got === (1L to 7L).map(_ -> 1L).toMap)
  }

  test("random graphs: labels equal union-find ground truth (seeded)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 5) {
      val n = 30
      val edges = Seq.fill(40)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(p => p._1 != p._2)
      // union-find with smaller-root-wins: find(i) IS the component min id
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = {
        var r = x
        while (parent(r) != r) r = parent(r)
        r
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val inGraph = edges.flatMap(e => Seq(e._1, e._2)).toSet
      val truth = inGraph.map(i => i -> find(i.toInt).toLong).toMap
      assert(comp(edges) === truth)
    }
  }

  test("best-effort non-convergence stays a typed, usable partial result") {
    val s = spark
    import s.implicits._
    // path 5-4-3-2-1 has diameter 4; one round cannot walk min=1 to node 5
    val pairs = Seq((5L, 4L), (4L, 3L), (3L, 2L), (2L, 1L)).toDF("id_a", "id_b")

    // best-effort: labels still usable (an over-segmentation — every label
    // is a reachable id, so dedup built on them never drops a non-duplicate)
    val r = Dedup.componentsBestEffort(pairs, col("id_a"), col("id_b"), maxIter = 1)
    assert(!r.converged && r.rounds === 1)
    val labels = r.labels.collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(labels.keySet === (1L to 5L).toSet)
    assert(labels.forall { case (id, lbl) => lbl <= id }) // monotone progress

    // sanity: enough rounds converge and report the flag
    val ok = Dedup.componentsBestEffort(pairs, col("id_a"), col("id_b"))
    assert(ok.converged && ok.rounds <= 6)
  }

  test("adversarial diameter: components() arms the star fallback, no maxIter raise") {
    val s = spark
    import s.implicits._
    // a 120-node chain — diameter 119 ≫ maxIter=2; min-label propagation
    // cannot converge, so the strict entry must switch to the O(log n)
    // large-star/small-star alternation and still return exact labels
    val pairs = (1L until 120L).map(i => (i + 1, i)).toDF("id_a", "id_b")
    val got = Dedup.components(pairs, col("id_a"), col("id_b"), maxIter = 2)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(got === (1L to 120L).map(_ -> 1L).toMap)
  }

  test("star alternation equals union-find ground truth on random graphs") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 3) {
      val n = 40
      val edges = Seq.fill(50)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = {
        var r = x
        while (parent(r) != r) r = parent(r)
        r
      }
      edges.filter(p => p._1 != p._2).foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val inGraph = edges.flatMap(e => Seq(e._1, e._2)).toSet
      val truth = inGraph.map(i => i -> find(i.toInt).toLong).toMap
      val got = Dedup.componentsStar(edges.toDF("id_a", "id_b"),
          col("id_a"), col("id_b"))
        .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
      assert(got === truth)
    }
  }

  test("star alternation converges in O(log n) rounds on a long path") {
    val s = spark
    import s.implicits._
    // 256-node path: diameter 255; the star alternation must finish well
    // inside its default 50-round cap (propagation would need 255 rounds)
    val pairs = (1L until 256L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = Dedup.componentsStar(pairs, col("id_a"), col("id_b"), maxIter = 20)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(got === (1L to 256L).map(_ -> 1L).toMap)
  }

  test("dropNearDups: no forced hint; AQE still broadcasts a small loser set") {
    val s = spark
    import s.implicits._
    val docs = (0L until 500L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    val comps = Seq((0L, 0L), (5L, 0L), (9L, 0L)).toDF("doc_id", "component")
    val out = Dedup.dropNearDups(docs, col("doc_id"), comps)
    val kept = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!kept.contains(5L) && !kept.contains(9L) && kept.contains(0L))
    assert(kept.size === 498)
    // the logical plan must carry NO broadcast hint (the r11 scale-killer:
    // a forced broadcast(losers) dies on dup-heavy corpora) …
    val logical = out.queryExecution.analyzed
    assert(!logical.toString.contains("ResolvedHint"),
      s"forced join hint in dropNearDups:\n$logical")
    // … while the runtime plan still broadcasts this actually-small side
    assert(out.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "small loser set not broadcast by the planner/AQE")
  }
}
