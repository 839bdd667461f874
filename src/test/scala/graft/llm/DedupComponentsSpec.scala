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
}
