package graft

/** Phase recorder for queries whose measured work happens INSIDE the query
  * builder (e.g. q_p8_route_mv materializes its routed read eagerly so the
  * session-wide routing confs can't leak). Bench resets it before each
  * sample and drains it after, folding a recorded "read" out of the builder
  * (setup) time — so BENCH's per-phase numbers measure the read path even
  * when the read can't be deferred to the returned DataFrame. Outside Bench
  * (Verify, tests) recording is a cheap map insert that nobody drains. */
object BenchPhases {
  private val recorded = scala.collection.concurrent.TrieMap[String, Double]()

  def reset(): Unit = recorded.clear()

  /** Time `f`, record its duration (seconds) under `phase`, return result. */
  def timed[T](phase: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    val dt = (System.nanoTime() - t0) / 1e9
    recorded.updateWith(phase) { case prev => Some(prev.getOrElse(0.0) + dt) }
    r
  }

  def drain(): Map[String, Double] = {
    val m = recorded.toMap
    recorded.clear()
    m
  }
}
