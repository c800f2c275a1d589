package graft

import org.scalatest.funsuite.AnyFunSuite

/** The shuffle-byte pins (ShuffleBudgets) are only a regression gate
  * if they stay in lockstep with the declared query set — a new query
  * landing without a budget would silently run unpinned. */
class ShuffleBudgetsSpec extends AnyFunSuite {
  test("every declared query carries a shuffle budget, and nothing extra") {
    val declared = SparkEntry.queries.keySet
    val pinned = ShuffleBudgets.mbAtSf01.keySet
    assert(pinned == declared,
      s"missing budgets: ${(declared -- pinned).toSeq.sorted.mkString(", ")}; " +
        s"stale budgets: ${(pinned -- declared).toSeq.sorted.mkString(", ")}")
  }

  test("budgets respect the 0.5 MB floor (sub-floor pins are noise)") {
    val bad = ShuffleBudgets.mbAtSf01.filter(_._2 < 0.5)
    assert(bad.isEmpty, bad.toString)
  }
}
