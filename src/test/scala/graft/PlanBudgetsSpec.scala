package graft

import org.scalatest.funsuite.AnyFunSuite

/** The plan-cost pins (PlanBudgets) are only a regression gate if
  * they stay in lockstep with the declared query set — a new query
  * landing without budgets would silently run unpinned. */
class PlanBudgetsSpec extends AnyFunSuite {
  private val declared = SparkEntry.queries.keySet

  test("every declared query carries all six budgets, and nothing extra") {
    for ((name, keys) <- Seq(
        "shuffle@sf0.1" -> PlanBudgets.shuffleMbAtSf01.keySet,
        "input@sf0.1" -> PlanBudgets.inputMbAtSf01.keySet,
        "stages@sf0.1" -> PlanBudgets.stagesAtSf01.keySet,
        "shuffle@sf0.01" -> PlanBudgets.shuffleMbAtSf001.keySet,
        "input@sf0.01" -> PlanBudgets.inputMbAtSf001.keySet,
        "stages@sf0.01" -> PlanBudgets.stagesAtSf001.keySet)) {
      assert(keys == declared,
        s"$name pins: missing ${(declared -- keys).toSeq.sorted.mkString(", ")}; " +
          s"stale ${(keys -- declared).toSeq.sorted.mkString(", ")}")
    }
  }

  test("byte budgets respect the 0.5 MB floor; stage budgets are positive") {
    for ((sh, in, st) <- Seq(
        (PlanBudgets.shuffleMbAtSf01, PlanBudgets.inputMbAtSf01,
          PlanBudgets.stagesAtSf01),
        (PlanBudgets.shuffleMbAtSf001, PlanBudgets.inputMbAtSf001,
          PlanBudgets.stagesAtSf001))) {
      val badSh = sh.filter(_._2 < 0.5)
      val badIn = in.filter(_._2 < 0.5)
      val badSt = st.filter(_._2 < 1)
      assert(badSh.isEmpty && badIn.isEmpty && badSt.isEmpty,
        s"$badSh $badIn $badSt")
    }
  }
}
