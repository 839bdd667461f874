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

  test("non-convergence is a typed result, not a bare require failure") {
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

    // strict entry: the typed exception, not IllegalArgumentException
    val e = intercept[Dedup.ComponentsNotConvergedException] {
      Dedup.components(pairs, col("id_a"), col("id_b"), maxIter = 1)
    }
    assert(e.getMessage.contains("1 label-propagation"))

    // sanity: enough rounds converge and report the flag
    val ok = Dedup.componentsBestEffort(pairs, col("id_a"), col("id_b"))
    assert(ok.converged && ok.rounds <= 6)
  }
}
