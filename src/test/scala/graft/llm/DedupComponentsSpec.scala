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
