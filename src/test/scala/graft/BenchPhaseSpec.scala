package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's phase-scoped cache release only works if every query is
  * categorized: a row in the wrong phase (or the leftover slot) runs
  * under another family's pinned caches — the exact cross-family memory
  * pressure that degraded round 7's numbers 3-6x. */
class BenchPhaseSpec extends AnyFunSuite {

  test("every SparkEntry query matches exactly one bench phase") {
    val names = SparkEntry.queries.keys.toSeq.sorted
    val bad = names.map { n =>
      (n, Bench.phases.count { case (_, member, _) => member(n) })
    }.filter(_._2 != 1)
    assert(bad.isEmpty,
      s"uncategorized or doubly-categorized queries (add the family to " +
        s"Bench.phases with its cache release): $bad")
  }

  test("every oracle key is a declared query") {
    // an oracle for a nonexistent query silently checks nothing
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without a query: $orphans")
  }
}
