package graft

import org.scalatest.funsuite.AnyFunSuite

/** The plan-cost pins (PlanBudgets) are only a regression gate if
  * they stay in lockstep with the declared query set — a new query
  * landing without budgets would silently run unpinned. */
class PlanBudgetsSpec extends AnyFunSuite {
  private val declared = SparkEntry.queries.keySet

  test("every declared query carries all three budgets, and nothing extra") {
    for ((name, keys) <- Seq(
        "shuffle" -> PlanBudgets.shuffleMbAtSf01.keySet,
        "input" -> PlanBudgets.inputMbAtSf01.keySet,
        "stages" -> PlanBudgets.stagesAtSf01.keySet)) {
      assert(keys == declared,
        s"$name pins: missing ${(declared -- keys).toSeq.sorted.mkString(", ")}; " +
          s"stale ${(keys -- declared).toSeq.sorted.mkString(", ")}")
    }
  }

  test("byte budgets respect the 0.5 MB floor; stage budgets are positive") {
    val badSh = PlanBudgets.shuffleMbAtSf01.filter(_._2 < 0.5)
    val badIn = PlanBudgets.inputMbAtSf01.filter(_._2 < 0.5)
    val badSt = PlanBudgets.stagesAtSf01.filter(_._2 < 1)
    assert(badSh.isEmpty && badIn.isEmpty && badSt.isEmpty,
      s"$badSh $badIn $badSt")
  }
}
