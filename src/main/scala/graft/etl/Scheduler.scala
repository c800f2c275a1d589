package graft.etl

import java.time.{LocalDate, LocalDateTime}

import scala.collection.mutable

/** Orchestration shim — the reference DAG's scheduling semantics
  * without the scheduler process (`fetch_stocks.py:284-317`: daily
  * `schedule_interval="0 0 * * *"`, `start_date=2023-01-01`,
  * `catchup=False`, per-task `retries`/`depends_on_past`, and the
  * `a >> b >> c` dependency chain).
  *
  * This is DRIVER-side control flow: each task body is a driver action
  * (e.g. `StarSchemaBuilder.build`, `Landing.appendDay`) that launches
  * distributed Spark jobs; the scheduling state itself is a handful of
  * instants and never touches the cluster. Everything is deterministic
  * given the injected `now` — no wall-clock reads inside the library,
  * so specs (and backfills) replay bit-identically.
  *
  * Scale shape: run enumeration is O(missed intervals) driver-side
  * arithmetic; the expensive work stays inside the task bodies, which
  * are the same partition-parallel builders audited elsewhere. A
  * 1000-executor cluster sees exactly the jobs the tasks submit —
  * the shim adds no exchanges, no collects, no per-row work.
  */
object Scheduler {

  /** Outcome of one task inside one DAG run. */
  sealed trait TaskState
  case class Succeeded(attempts: Int) extends TaskState
  /** All `1 + retries` attempts failed; `error` is the LAST failure. */
  case class Failed(attempts: Int, error: Throwable) extends TaskState
  /** Not attempted: an upstream dependency failed or was skipped. */
  case object UpstreamFailed extends TaskState
  /** Not attempted: `dependsOnPast` and the previous run's instance of
    * this task did not succeed (Airflow `depends_on_past` semantics). */
  case object PastFailed extends TaskState

  /** One unit of work. `run` receives the logical run date (the
    * schedule instant being executed, NOT the wall clock — the
    * reference tasks receive the same via `provide_context`).
    *
    * `retries`/`dependsOnPast` default to the reference's
    * `default_args` (fetch_stocks.py:285-290): 0 retries, no
    * depends-on-past. */
  case class Task(id: String, run: LocalDateTime => Unit,
      retries: Int = 0, dependsOnPast: Boolean = false)

  /** Minimal 5-field cron (minute hour day-of-month month day-of-week)
    * covering the forms a schedule_interval uses: `*`, `n`, `a-b`,
    * `a,b,c`, `*&#47;n`. Day-of-month and day-of-week combine as OR when
    * both are restricted (cron's documented quirk), AND otherwise. */
  case class Cron(expr: String) {
    private val Array(minF, hourF, domF, monF, dowF) = {
      val fs = expr.trim.split("\\s+")
      require(fs.length == 5, s"cron '$expr': expected 5 fields, got ${fs.length}")
      fs
    }
    private def parse(field: String, lo: Int, hi: Int): Set[Int] =
      field.split(",").toSet.flatMap { part: String =>
        part match {
          case "*" => (lo to hi).toSet
          case s if s.startsWith("*/") => (lo to hi by s.drop(2).toInt).toSet
          case s if s.contains("-") =>
            val Array(a, b) = s.split("-").map(_.toInt); (a to b).toSet
          case s => Set(s.toInt)
        }
      }.map { v => require(v >= lo && v <= hi,
        s"cron '$expr': value $v outside [$lo,$hi]"); v }

    private val mins = parse(minF, 0, 59)
    private val hours = parse(hourF, 0, 23)
    private val doms = parse(domF, 1, 31)
    private val mons = parse(monF, 1, 12)
    // cron dow: 0 and 7 are both Sunday; normalize to ISO 1..7.
    private val dows = parse(dowF, 0, 7).map(d => if (d == 0) 7 else d)

    def matches(t: LocalDateTime): Boolean = {
      val dateOk =
        if (domF != "*" && dowF != "*")
          doms(t.getDayOfMonth) || dows(t.getDayOfWeek.getValue)
        else doms(t.getDayOfMonth) && dows(t.getDayOfWeek.getValue)
      mins(t.getMinute) && hours(t.getHour) && mons(t.getMonthValue) && dateOk
    }

    /** First schedule instant STRICTLY after `t`. Minute granularity;
      * bounded scan (cron repeats within 4 years ≫ any real gap). */
    def next(t: LocalDateTime): LocalDateTime = {
      var c = t.withSecond(0).withNano(0).plusMinutes(1)
      val limit = t.plusYears(4)
      while (!matches(c)) {
        c = c.plusMinutes(1)
        require(c.isBefore(limit), s"cron '$expr' never fires")
      }
      c
    }
  }

  /** A DAG: tasks + `a >> b` edges + the schedule envelope. Mirrors
    * the `with DAG(...)` block 1:1 (dagId, schedule, startDate,
    * catchup). `deps` lists (upstream, downstream) pairs. */
  case class Dag(dagId: String, schedule: Cron, startDate: LocalDate,
      catchup: Boolean, tasks: Seq[Task], deps: Seq[(String, String)]) {
    private val byId = tasks.map(t => t.id -> t).toMap
    require(byId.size == tasks.size, s"$dagId: duplicate task ids")
    deps.foreach { case (u, d) =>
      require(byId.contains(u) && byId.contains(d),
        s"$dagId: dep $u >> $d names an unknown task")
    }

    /** Topological order, deterministic (declaration order among
      * ready tasks). Cycles are a construction error. */
    lazy val topo: Seq[Task] = {
      val indeg = mutable.LinkedHashMap(tasks.map(t => t.id -> 0): _*)
      deps.foreach { case (_, d) => indeg(d) += 1 }
      val out = mutable.ArrayBuffer[Task]()
      val ready = mutable.Queue(tasks.filter(t => indeg(t.id) == 0): _*)
      while (ready.nonEmpty) {
        val t = ready.dequeue(); out += t
        deps.collect { case (u, d) if u == t.id => d }.foreach { d =>
          indeg(d) -= 1
          if (indeg(d) == 0) ready += byId(d)
        }
      }
      require(out.size == tasks.size, s"$dagId: dependency cycle")
      out.toSeq
    }

    private def upstreamOf(id: String): Seq[String] =
      deps.collect { case (u, d) if d == id => u }

    /** Execute ONE logical run. Failed tasks exhaust their retries;
      * everything downstream of a failure is `UpstreamFailed` (the
      * Airflow default trigger rule, all_success). `past` carries the
      * previous run's states for `dependsOnPast` tasks. */
    def execute(runDate: LocalDateTime,
        past: Map[String, TaskState] = Map.empty): Map[String, TaskState] = {
      val states = mutable.LinkedHashMap[String, TaskState]()
      topo.foreach { t =>
        val blocked = upstreamOf(t.id).exists(u => states(u) match {
          case Succeeded(_) => false
          case _ => true
        })
        val pastBlocked = t.dependsOnPast && (past.get(t.id) match {
          case None => false // first run: depends_on_past is vacuous
          case Some(Succeeded(_)) => false
          case Some(_) => true
        })
        states(t.id) =
          if (blocked) UpstreamFailed
          else if (pastBlocked) PastFailed
          else attempt(t, runDate)
      }
      states.toMap
    }

    private def attempt(t: Task, runDate: LocalDateTime): TaskState = {
      var tries = 0
      var lastErr: Throwable = null
      while (tries <= t.retries) {
        tries += 1
        try { t.run(runDate); return Succeeded(tries) }
        catch { case e: Exception => lastErr = e }
      }
      Failed(tries, lastErr)
    }

    /** The logical run instants due at `now`, given the last completed
      * run (None = never ran). Airflow semantics:
      *  - catchup=true: every missed schedule instant in
      *    (lastRun or startDate, now], oldest first — a backfill;
      *  - catchup=false: only the LATEST due instant (the reference's
      *    setting — a scheduler that was down for a week runs once). */
    def dueRuns(lastRun: Option[LocalDateTime],
        now: LocalDateTime): Seq[LocalDateTime] = {
      val from = lastRun.getOrElse(startDate.atStartOfDay.minusMinutes(1))
      val all = Iterator.iterate(schedule.next(from))(schedule.next)
        .takeWhile(!_.isAfter(now)).toSeq
      if (catchup) all else all.takeRight(1)
    }

    /** Drive the DAG to `now`: enumerate due runs, execute each in
      * order (threading past states for dependsOnPast), return
      * (runDate → task states) in execution order. This is the whole
      * scheduler loop — call it from any clock source (the reference
      * pipeline is a daily tick). */
    def catchUpTo(now: LocalDateTime, lastRun: Option[LocalDateTime],
        pastStates: Map[String, TaskState] = Map.empty)
        : Seq[(LocalDateTime, Map[String, TaskState])] = {
      var past = pastStates
      dueRuns(lastRun, now).map { rd =>
        val st = execute(rd, past)
        past = st
        rd -> st
      }
    }
  }

  /** The reference DAG, reconstructed: fetch stocks >> fetch world
    * bank >> build star schema, daily at midnight from 2023-01-01,
    * catchup off (fetch_stocks.py:292-317). Task bodies are injected —
    * the engine supplies `ExternalAdapters` + `StarSchemaBuilder`
    * closures; specs supply probes. */
  def referenceDag(fetchStocks: LocalDateTime => Unit,
      fetchWorldBank: LocalDateTime => Unit,
      buildStar: LocalDateTime => Unit): Dag =
    Dag("stock_market_star_schema", Cron("0 0 * * *"),
      LocalDate.of(2023, 1, 1), catchup = false,
      tasks = Seq(
        Task("fetch_and_save_stocks", fetchStocks),
        Task("fetch_and_save_world_bank_data", fetchWorldBank),
        Task("create_star_schema", buildStar)),
      deps = Seq(
        "fetch_and_save_stocks" -> "fetch_and_save_world_bank_data",
        "fetch_and_save_world_bank_data" -> "create_star_schema"))
}
