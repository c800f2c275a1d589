package graft

import java.time.{LocalDate, LocalDateTime}

import scala.collection.mutable

import org.scalatest.funsuite.AnyFunSuite
import graft.etl.Scheduler
import graft.etl.Scheduler._

/** Orchestration shim vs the reference DAG's semantics
  * (fetch_stocks.py:284-317): cron schedule, start_date + catchup run
  * enumeration, `a >> b >> c` ordering, retries, downstream skip,
  * depends_on_past. Pure driver-side — no SparkSession needed. */
class SchedulerSpec extends AnyFunSuite {

  private def dt(s: String) = LocalDateTime.parse(s)

  test("cron '0 0 * * *' fires daily at midnight (the reference schedule)") {
    val c = Cron("0 0 * * *")
    assert(c.next(dt("2023-01-01T00:00:00")) == dt("2023-01-02T00:00"))
    assert(c.next(dt("2023-01-01T13:37:12")) == dt("2023-01-02T00:00"))
    assert(c.matches(dt("2023-06-15T00:00")))
    assert(!c.matches(dt("2023-06-15T00:01")))
  }

  test("cron field forms: step, range, list, dom/dow OR rule") {
    assert(Cron("*/15 * * * *").next(dt("2024-01-01T00:20")) ==
      dt("2024-01-01T00:30"))
    assert(Cron("0 9-17 * * *").next(dt("2024-01-01T17:30")) ==
      dt("2024-01-02T09:00"))
    assert(Cron("0 0 1,15 * *").next(dt("2024-01-02T00:00")) ==
      dt("2024-01-15T00:00"))
    // dow: 2024-01-06 is a Saturday
    assert(Cron("0 0 * * 6").matches(dt("2024-01-06T00:00")))
    // restricted dom AND dow → OR (classic cron quirk): fires on the
    // 10th OR any Monday. 2024-01-08 is a Monday, not the 10th.
    assert(Cron("0 0 10 * 1").matches(dt("2024-01-08T00:00")))
    assert(Cron("0 0 10 * 1").matches(dt("2024-01-10T00:00")))
    assert(!Cron("0 0 10 * 1").matches(dt("2024-01-09T00:00")))
    intercept[IllegalArgumentException](Cron("0 0 * *"))
    intercept[IllegalArgumentException](Cron("61 0 * * *"))
  }

  private def chainDag(catchup: Boolean, log: mutable.Buffer[String],
      failWorldBank: Int = 0) = {
    val wbFails = mutable.Map("n" -> failWorldBank)
    Scheduler.referenceDag(
      fetchStocks = rd => log += s"stocks@${rd.toLocalDate}",
      fetchWorldBank = rd => {
        if (wbFails("n") > 0) { wbFails("n") -= 1; sys.error("wb down") }
        log += s"wb@${rd.toLocalDate}"
      },
      buildStar = rd => log += s"star@${rd.toLocalDate}")
      .copy(catchup = catchup)
  }

  test("execute runs the chain in dependency order") {
    val log = mutable.Buffer[String]()
    val states = chainDag(catchup = false, log).execute(dt("2023-01-02T00:00"))
    assert(log.toSeq == Seq("stocks@2023-01-02", "wb@2023-01-02", "star@2023-01-02"))
    assert(states.values.forall(_ == Succeeded(1)))
  }

  test("a failed task skips everything downstream (all_success rule)") {
    val log = mutable.Buffer[String]()
    val states = chainDag(catchup = false, log, failWorldBank = 99)
      .execute(dt("2023-01-02T00:00"))
    assert(log.toSeq == Seq("stocks@2023-01-02")) // star never attempted
    assert(states("fetch_and_save_stocks") == Succeeded(1))
    assert(states("fetch_and_save_world_bank_data").isInstanceOf[Failed])
    assert(states("create_star_schema") == UpstreamFailed)
  }

  test("retries re-attempt up to the budget, then fail with the last error") {
    var calls = 0
    val flaky = Dag("d", Cron("0 0 * * *"), LocalDate.of(2023, 1, 1),
      catchup = false,
      tasks = Seq(Task("t", _ => { calls += 1; if (calls < 3) sys.error(s"boom $calls") },
        retries = 2)),
      deps = Nil)
    assert(flaky.execute(dt("2023-01-02T00:00"))("t") == Succeeded(3))
    calls = 0
    val exhausted = flaky.copy(tasks = Seq(flaky.tasks.head.copy(retries = 1)))
    exhausted.execute(dt("2023-01-02T00:00"))("t") match {
      case Failed(attempts, err) =>
        assert(attempts == 2 && err.getMessage == "boom 2")
      case other => fail(s"expected Failed, got $other")
    }
  }

  test("catchup=false runs only the latest due instant after downtime") {
    val log = mutable.Buffer[String]()
    val runs = chainDag(catchup = false, log)
      .catchUpTo(dt("2023-01-10T06:00"), lastRun = Some(dt("2023-01-03T00:00")))
    // a week of downtime → exactly one run, at the latest schedule tick
    assert(runs.map(_._1) == Seq(dt("2023-01-10T00:00")))
    assert(log.toSeq == Seq("stocks@2023-01-10", "wb@2023-01-10", "star@2023-01-10"))
  }

  test("catchup=true backfills every missed instant oldest-first") {
    val log = mutable.Buffer[String]()
    val runs = chainDag(catchup = true, log)
      .catchUpTo(dt("2023-01-04T12:00"), lastRun = None)
    // never ran: backfill from start_date (first tick = start_date
    // midnight itself, Airflow's first interval)
    assert(runs.map(_._1) == Seq(dt("2023-01-01T00:00"), dt("2023-01-02T00:00"),
      dt("2023-01-03T00:00"), dt("2023-01-04T00:00")))
    assert(log.count(_.startsWith("stocks@")) == 4)
  }

  test("nothing due before the next tick") {
    val d = chainDag(catchup = true, mutable.Buffer[String]())
    assert(d.dueRuns(Some(dt("2023-01-05T00:00")), dt("2023-01-05T23:59")).isEmpty)
  }

  test("depends_on_past blocks a task after a failed previous run") {
    var fail = true
    val d = Dag("d", Cron("0 0 * * *"), LocalDate.of(2023, 1, 1),
      catchup = true,
      tasks = Seq(Task("t", _ => { if (fail) sys.error("first day down") },
        dependsOnPast = true)),
      deps = Nil)
    val r1 = d.execute(dt("2023-01-01T00:00"))
    assert(r1("t").isInstanceOf[Failed])
    fail = false
    // second run blocked by the failed past instance
    assert(d.execute(dt("2023-01-02T00:00"), past = r1)("t") == PastFailed)
    // a clean past unblocks
    assert(d.execute(dt("2023-01-03T00:00"),
      past = Map("t" -> Succeeded(1)))("t") == Succeeded(1))
  }

  test("cycles and unknown deps are construction errors") {
    intercept[IllegalArgumentException] {
      Dag("d", Cron("0 0 * * *"), LocalDate.of(2023, 1, 1), catchup = false,
        tasks = Seq(Task("a", _ => ()), Task("b", _ => ())),
        deps = Seq("a" -> "b", "b" -> "a")).topo
    }
    intercept[IllegalArgumentException] {
      Dag("d", Cron("0 0 * * *"), LocalDate.of(2023, 1, 1), catchup = false,
        tasks = Seq(Task("a", _ => ())), deps = Seq("a" -> "ghost"))
    }
  }
}
