package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry consistency for the driver contract: every oracle and every
  * verify-only marker must point at a registered query — a typo here would
  * silently drop a correctness check or bench a verification twin. */
class SparkEntrySpec extends AnyFunSuite {

  test("every oracle key names a registered query") {
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracles without queries: $dangling")
  }

  test("every verify-only marker names a registered query") {
    val dangling = SparkEntry.verifyOnly -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"verifyOnly without queries: $dangling")
  }

  test("verify-only twins keep the bench production-only but stay verified") {
    // each verify-only query is either itself oracle-checked or a rows-only
    // query whose oracle-checked twin is registered — never unchecked
    SparkEntry.verifyOnly.foreach { q =>
      assert(SparkEntry.oracleSql.contains(q),
        s"$q is verify-only but carries no oracle")
    }
    // and the bench set is non-trivial after exclusion
    assert((SparkEntry.queries.keySet -- SparkEntry.verifyOnly).size >= 50)
  }
}
