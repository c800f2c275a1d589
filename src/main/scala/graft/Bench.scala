package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Per-stage byte counters fed by task-end events. Timing on this
  * host carries 2-4× contention noise (BASELINE.md; BENCH_r10/r11
  * driver totals vs idle re-runs), but the BYTES a plan shuffles and
  * scans are a function of plan + data alone — the contention-immune
  * regression signal. Keyed by stageId (global, unique), summed over
  * a query's own stage set so concurrent history can't bleed in. */
private final class StageBytesListener extends SparkListener {
  val shuffleWrite = scala.collection.concurrent.TrieMap.empty[Int, Long]
  val input = scala.collection.concurrent.TrieMap.empty[Int, Long]
  // Stage IDs whose SparkListenerStageCompleted has been delivered to
  // THIS listener. The bus delivers events to a listener in post
  // order, and the DAGScheduler posts every task-end of a stage before
  // that stage's completed event — so membership here PROVES the byte
  // sums above are final for that stage (the task-count invariant,
  // without racing the status tracker's independently-drained queue).
  val completed = scala.collection.concurrent.TrieMap.empty[Int, Unit]
  override def onStageCompleted(
      s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
    completed.put(s.stageInfo.stageId, ())
  override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
    val m = t.taskMetrics
    if (m != null) {
      shuffleWrite.updateWith(t.stageId)(p =>
        Some(p.getOrElse(0L) + m.shuffleWriteMetrics.bytesWritten))
      input.updateWith(t.stageId)(p =>
        Some(p.getOrElse(0L) + m.inputMetrics.bytesRead))
    }
  }
}

object Bench {
  /** The timed (and byte-counted) action: execute the query's OWN
    * physical plan via `queryExecution.toRdd`, not `df.count()`.
    * `count()` executes a DERIVED aggregate plan in which Catalyst
    * prunes everything the count does not reference — including
    * whole Window nodes (a plan probe confirmed q_star_schema's
    * count() plan carries 0 of its 2 WindowExec nodes, and the r10
    * memory note measured a 26 s SimHash projection as 0.8 s through
    * a count probe). toRdd executes the declared plan — sorts,
    * windows, projections included — while still excluding
    * driver-side materialization, which is the same boundary the
    * DuckDB comparator pays on its side (fetchall). This is the
    * convention ScaleProbe's metrics pass has always used; r15
    * makes the timed runs and the stage/byte counting run use it
    * too, so the emitted walls, stage counts and byte pins all
    * describe the plan the hash verifies. BenchActionSpec gates the
    * distinction (declared plan's Window count vs the count() plan's).
    */
  def benchAction(df: org.apache.spark.sql.DataFrame): Long =
    df.queryExecution.toRdd.count()

  /** The DISCLOSED untimed-warm-up artifact list, emitted verbatim in
    * the bench JSON (r13 ADVICE) and pinned by MemoFenceSpec against a
    * committed allowlist (r18 verdict #6): new precomputation cannot
    * slip into the untimed region without a reviewed diff of this
    * sequence AND the spec's copy. Object-level so the spec can read
    * it without running a bench. */
  val prebuilt: Seq[String] = Seq("shingle_cache", "embed_norms_cache",
    "token_count_cache", "skipping_layout", "ivfpq_index",
    "bucket_join_tables", "compacted_layout", "compact_partitioned_layout",
    "scd2_state", "sketch_rollup_state", "stream_cdc_state",
    "stream_scd2_state", "stream_agg_state", "stream_band_registry",
    "cleaned_corpus_cache", "media_layout", "ivfpq_advanced_index",
    "ivfpq_removed_index", "ivfpq_leafwise_index", "jsonl_layout",
    "stream_jsonl_state")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Log quieting lives in src/main/resources/graft-quiet-log4j2
    // .properties (root=error), activated by the -Dlog4j2
    // .configurationFile option build.sbt sets for `run`/`runMain` —
    // it is NOT auto-discovered, so launching outside sbt (spark-
    // submit / java -cp) must pass that option itself. A config
    // present at logger init is the only thing that beats Spark's own
    // default-config install, which happens during session
    // construction — before setLogLevel could run.
    // A/B knob for floor attribution (default = cpus, the committed
    // methodology): how much of the per-query floor is reducer count?
    val shufflePartitions = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    // A/B knob for the shuffle-block codec (optimization guide §2.3:
    // "There is no universal answer — measure shuffle bytes written
    // and stage time with each"). Default = Spark's own default (lz4)
    // so the driver's bench and the byte pins are unchanged; zstd is
    // the candidate where shuffle crosses a real network (better
    // ratio for more CPU). Non-default values deactivate the plan
    // pins below: shuffle_mb budgets are compressed-byte budgets.
    val ioCodec = sys.env.getOrElse("SPARK_GRAFT_IO_CODEC", "lz4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      // Always use the sort-based shuffle writer (1 data file + index
      // per map task). The default bypass-merge path (kicks in ≤200
      // reduce partitions) creates one file PER REDUCER per map task —
      // 32×32 tiny file creates per shuffle, ~0.35 s/stage of pure
      // filesystem metadata on this container; measured 3.5× faster
      // per shuffle stage with the sort writer. Real clusters run
      // >200 reduce partitions and take this path anyway.
      .config("spark.shuffle.sort.bypassMergeThreshold", "0")
      .config("spark.io.compression.codec", ioCodec)
      .getOrCreate()
    // Belt-and-braces with the resources config: the benchmark's only
    // contract is the one JSON result line, and any stray WARN
    // (CacheManager, WindowExec, Hadoop native-lib, …) on stderr has
    // broken the harness's tail parse before.
    spark.sparkContext.setLogLevel("ERROR")
    // Session-shared artifacts the untimed warm-up pre-builds (caches
    // + persisted layouts), DISCLOSED in the emitted JSON as
    // "prebuilt" (r13 ADVICE; now the object-level field above): the
    // DuckDB oracle recomputes the equivalent work per query, so a
    // reader of the archived totals needs the asymmetry on the
    // record, not just warm_cache:true.
    // Untimed JVM warm-up: exercise codegen, shuffle, window, join and
    // the parquet reader on the two tiny dimension tables so the first
    // timed query doesn't absorb JIT + first-codegen cost.
    locally {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      spark.range(1000000).selectExpr("sum(id)").collect()
      val r = spark.read.parquet(s"$sfDir/region.parquet")
      val n = spark.read.parquet(s"$sfDir/nation.parquet")
      n.join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name")).agg(count(lit(1)).as("c"), sum(col("n_nationkey")).as("s"))
        // real partition key: partitionBy(lit) = "no partitioning" and
        // logs a WindowExec WARN per run — noise in the driver's tail
        .withColumn("rk", rank().over(Window.partitionBy(col("r_name")).orderBy(col("c"))))
        .orderBy(col("r_name")).collect()
      // Fill the session-shared shingle cache (the materialized
      // artifact three dedup queries consume) so per-query timings
      // measure the queries, not the one-time store build. Declared in
      // the emitted JSON as "warm_cache": the DuckDB oracle recomputes
      // shingles per query, so cross-engine totals differ by that
      // one-time build unless consumers account for it.
      SparkEntry.queries("q_text_fingerprint")(spark, sfDir).count()
      // Same for the shared embedding-norms cache (three embed queries
      // consume it) — q_similarity_cosine is its cheapest consumer.
      SparkEntry.queries("q_similarity_cosine")(spark, sfDir).count()
      // And the shared (doc, token) count cache (token_df / tfidf /
      // entropy consume it) — q_token_df is its cheapest consumer.
      SparkEntry.queries("q_token_df")(spark, sfDir).count()
      // And the two persisted-layout memos (skipping layout+manifest,
      // cid-partitioned IVF-PQ index) — build-once artifacts of the
      // same class as the caches above: a RUNS=1 sweep would otherwise
      // charge the one-time write to the query's only timed run
      // (min-of-3 discards it, min-of-1 cannot).
      SparkEntry.queries("q_skipping_prune")(spark, sfDir).count()
      SparkEntry.queries("q_ivfpq_probe")(spark, sfDir).count()
      SparkEntry.queries("q_bucket_join")(spark, sfDir).count()
      SparkEntry.queries("q_compact_scan")(spark, sfDir).count()
      SparkEntry.queries("q_compact_partitioned")(spark, sfDir).count()
      SparkEntry.queries("q_scd2_advance")(spark, sfDir).count()
      SparkEntry.queries("q_sketch_rollup_band")(spark, sfDir).count()
      // the streamed-then-published states (real availableNow stream
      // runs) — the same build-once lifecycle as the states above
      SparkEntry.queries("q_stream_cdc_publish")(spark, sfDir).count()
      SparkEntry.queries("q_stream_scd2_publish")(spark, sfDir).count()
      SparkEntry.queries("q_stream_agg_publish")(spark, sfDir).count()
      SparkEntry.queries("q_stream_band_publish")(spark, sfDir).count()
      // the streamed JSONL intake state (r18 — the fifth lifecycle:
      // upsert + set-fold publish of the clean/dead-letter split)
      SparkEntry.queries("q_stream_jsonl_publish")(spark, sfDir).count()
      // the cleaned-corpus session memo (clean-once/derive-many):
      // q_train_pipeline derives from it; the one-time clean is the
      // prebuilt artifact, the DuckDB oracle recomputes it per query
      SparkEntry.queries("q_train_pipeline")(spark, sfDir).count()
      // the media layout (WAV/PNG payload synthesis + write — the
      // build-once artifact q_media_meta decodes per invocation)
      SparkEntry.queries("q_media_meta")(spark, sfDir).count()
      // the incrementally-advanced IVF-PQ index (two folds + the
      // declared replay no-op — the same build-once lifecycle)
      SparkEntry.queries("q_ivfpq_advance")(spark, sfDir).count()
      // the add→remove→add lifecycle index (r17 — the remove_ids half)
      SparkEntry.queries("q_ivfpq_remove")(spark, sfDir).count()
      // the leaf-wise fold lifecycle index (r18 — crash-resumed
      // O(touched lists) add + cid-carrying remove)
      SparkEntry.queries("q_ivfpq_leafwise")(spark, sfDir).count()
      // the JSONL interchange layout (r18 — zstd + corrupted gzip
      // shards the quarantine query reads back)
      SparkEntry.queries("q_jsonl_quarantine")(spark, sfDir).count()
    }
    // Three timed runs per query, min reported (declared in the JSON).
    // This VM shows multi-second scheduler stalls at random (observed
    // 2-4x inflation on single runs with an idle host); min-of-N keeps
    // stalls from masquerading as engine cost while still charging
    // each query its own planning + codegen. N=3 because one stall can
    // span two consecutive runs of the same query.
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    // Iteration knob: SPARK_GRAFT_BENCH_ONLY=q_a,q_b restricts the
    // timed set (the warm-up and methodology stay identical), so a
    // single query can be re-measured without paying the full sweep.
    val only: Set[String] = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty)
    def timedPass(runsN: Int, coldEachQuery: Boolean): Map[String, Double] =
      SparkEntry.queries
        .filter { case (name, _) => only.isEmpty || only(name) }
        .map { case (name, fn) =>
        if (coldEachQuery) graft.queries.ExtendedQueries.releaseCaches(spark, sfDir)
        val times = (1 to runsN).map { _ =>
          val t0 = System.nanoTime()
          val ok = try { benchAction(fn(spark, sfDir)); true } catch { case _: Throwable => false }
          if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
        }
        name -> (if (times.contains(-1.0)) -1.0 else times.min)
      }
    def toJson(m: Map[String, Double]): String =
      m.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    // Floor calibration: a constant two-stage query (tiny scan →
    // partial agg → one exchange → final agg) whose cost is pure Spark
    // job machinery — DAG scheduling, task launch, shuffle file churn —
    // with no data or plan work worth naming. Emitted as "floor_sec"
    // so a reader can normalize totals across hosts/runs: r6 (49.7 s)
    // and r8 (32.3 s vs 15.5 s idle) both showed ~2× host-contention
    // inflation when bench follows correctness immediately, and this
    // number moves with the contention while the engine's per-query
    // work does not. Expected ~0.04-0.08 s/query on an idle host;
    // multiply by ~2-4 stages/query × 115 queries to see how much of
    // a total is floor.
    def floorProbe(): Double = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      spark.range(1000).groupBy((org.apache.spark.sql.functions.col("id") % 32).as("k"))
        .count().count()
      (System.nanoTime() - t0) / 1e9
    }.min
    // MID-SWEEP floor probes (r18 — closing the one-shot-probe gap,
    // r17 verdict #1): the two end-of-sweep probes under-correct
    // contention that arrives and leaves BETWEEN them — the archived
    // BENCH_r17.json carried floorline_excess 22.15 s from mid-sweep
    // scheduler bursts where the idle engine signal was 3.38 s, on
    // byte-identical plans and near-idle END probes. So the probe now
    // interleaves: one min-of-3 reading every `probeEvery` queries,
    // and each query's floorline is priced by the WORSE of the two
    // probes BRACKETING its segment — a burst confined to one stretch
    // of the sweep raises that stretch's floorline (and only that
    // stretch's), so the excess it would have faked is absorbed where
    // it happened instead of surviving into the cross-round record.
    // Probe cost (~0.5 s × ~10 probes at the full 146) is bench
    // harness time, never counted into total or any per-query wall.
    val probeEvery = 15
    val floorProbes = scala.collection.mutable.ArrayBuffer[Double]()
    val segmentOf = scala.collection.mutable.HashMap[String, Int]()
    floorProbes += floorProbe()
    val results: Map[String, Double] = SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .toSeq.zipWithIndex
      .map { case ((name, fn), i) =>
        if (i > 0 && i % probeEvery == 0) floorProbes += floorProbe()
        segmentOf(name) = floorProbes.size - 1
        val times = (1 to runs).map { _ =>
          val t0 = System.nanoTime()
          val ok = try { benchAction(fn(spark, sfDir)); true } catch { case _: Throwable => false }
          if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
        }
        name -> (if (times.contains(-1.0)) -1.0 else times.min)
      }.toMap
    // Final reading after the timed pass (r14 verdict #2) — with the
    // interleaved probes it closes the LAST segment's bracket; the
    // first/last readings keep their historical field names so
    // archived rounds stay comparable.
    floorProbes += floorProbe()
    val floorSec = floorProbes.head
    val floorSecAfter = floorProbes.last
    // Per-query PLANNED-STAGE counts, measured (not plan-guessed): one
    // extra run per query under a job group, stages summed from the
    // public status tracker (includes stages skipped via shuffle
    // reuse — "what the query schedules", which is what the floor
    // multiplies). Purpose: floor-normalize the per-query report.
    // floor_sec measures a TWO-stage probe, so floor_per_stage_sec =
    // floor_sec/2 is the scheduling cost of one materialized stage —
    // an UPPER bound per AQE stage (tiny AQE sub-stages run cheaper
    // than the probe's full shuffle). Reading rule (BASELINE.md):
    // wall ≤ stages × floor_per_stage_sec ⇒ the query is
    // scheduling-floor-dominated, and its ratio against a 0.03 s
    // DuckDB twin (q_intersect, q_except, …) carries no engine
    // signal.
    // The same counting run also yields each query's deterministic
    // byte costs: its distinct stage IDs are summed against the
    // listener's per-stage shuffle-write / input-read tallies. Task-end
    // events are delivered async; the sums are read after a bounded
    // settle loop (stage-completed coverage, with a long stability
    // fallback — see settleStages) so a lagging bus cannot
    // undercount. Skipped stages (shuffle reuse) have no
    // task events and correctly contribute 0 — the counting run builds
    // a FRESH frame, so its own exchanges all execute.
    val bytesListener = new StageBytesListener
    spark.sparkContext.addSparkListener(bytesListener)
    // Settle on the task-count invariant, not value stability alone
    // (r12 ADVICE: two identical readings 50 ms apart can coincide
    // with a >50 ms bus stall or GC pause and silently undercount).
    // Primary condition: every stage in the set has its
    // stage-completed event delivered — by bus FIFO that implies all
    // its task-end bytes are summed (see StageBytesListener.completed)
    // — which is also the instant fast path for the common all-stages-
    // executed case. Stages with NO events (shuffle-reuse skips never
    // submit) can't complete, so for those fall back to a far longer
    // stability horizon: 4 consecutive identical readings 100 ms
    // apart (a stall must now span 400 ms, not 50, to fake
    // quiescence). One settle per query covers both byte maps.
    def settleStages(stageIds: Seq[Int]): Unit = {
      def reading(): (Long, Long) =
        (stageIds.map(bytesListener.shuffleWrite.getOrElse(_, 0L)).sum,
          stageIds.map(bytesListener.input.getOrElse(_, 0L)).sum)
      var stable = 0
      var prev = (-1L, -1L)
      var spins = 0
      while (spins < 100 &&
          !stageIds.forall(bytesListener.completed.contains) &&
          stable < 4) {
        val cur = reading()
        stable = if (cur == prev) stable + 1 else 0
        prev = cur
        Thread.sleep(100)
        spins += 1
      }
    }
    val stageStats: Map[String, (Int, Long, Long)] = SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .map { case (name, fn) =>
        val group = s"graft-bench-$name"
        spark.sparkContext.setJobGroup(group, name)
        val n = try {
          // NonFatal only: a fatal error (OOM, interrupt) must
          // propagate, not be read as a completed counting run. A
          // query whose counting run failed reports the sentinel -1
          // so a partial job/stage count is never mistaken for the
          // planned-stage truth in the floor-normalization rule.
          val ok =
            try { benchAction(fn(spark, sfDir)); true }
            catch { case scala.util.control.NonFatal(_) => false }
          if (!ok) (-1, -1L, -1L)
          else {
            val tr = spark.sparkContext.statusTracker
            // distinct: AQE materializes each exchange as its own job,
            // and jobs re-list upstream stages they share — summing per
            // job would double-count the common prefix
            val stageIds = tr.getJobIdsForGroup(group).flatMap(id =>
              tr.getJobInfo(id).toSeq.flatMap(_.stageIds.map(_.toInt)))
              .distinct.toSeq
            settleStages(stageIds)
            (stageIds.length,
              stageIds.map(bytesListener.shuffleWrite.getOrElse(_, 0L)).sum,
              stageIds.map(bytesListener.input.getOrElse(_, 0L)).sum)
          }
        } finally spark.sparkContext.clearJobGroup()
        name -> n
      }
    val stageCounts: Map[String, Int] = stageStats.map { case (k, v) => k -> v._1 }
    def mb(b: Long): Double =
      if (b < 0) -1.0 else math.round(b / 1048576.0 * 1000.0) / 1000.0
    val shuffleMb: Map[String, Double] =
      stageStats.map { case (k, v) => k -> mb(v._2) }
    val inputMb: Map[String, Double] =
      stageStats.map { case (k, v) => k -> mb(v._3) }
    def toJsonInt(m: Map[String, Int]): String =
      m.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    // Regression pins (BASELINE.md §bench): per-query budgets in IDLE
    // seconds at sf0.1, floor-normalized — a contended host (floor_sec
    // above the documented 0.138 s idle reading) scales the budget up
    // proportionally so contention cannot fake a regression. A breach
    // does not abort the bench (a failed bench run hides every other
    // number); it is REPORTED in the JSON line the driver files, so
    // the regression is on the record the round it happens.
    // q_rsi 1.5 (r15 recalibration — two shifts in one round):
    // (a) CONVENTION: benchAction now executes the declared plan, so
    //     q_rsi's wall includes the final result sort count() used to
    //     prune — isolated min-of-9 idle moved 0.68-0.77 → ~0.95-0.99,
    //     a measured +0.25 s that is plan cost, not drift. The r9
    //     bisection disposition (two fused window passes over one
    //     exchange is the minimal plan; both restructurings measured
    //     worse) is settled and UNCHANGED — do not re-attempt.
    // (b) CONTENTION (r14 verdict #2, first false positive): sweep
    //     min-of-3 readings carry cross-query cache/GC interference
    //     the pre-sweep floor probe under-captures, so the budget
    //     normalizes by the WORST interleaved floor probe (r18 —
    //     was the worse of the two end probes)
    //     and the sweep-context alarm line is 1.5 — ~0.5 s above the
    //     isolated idle reading (the old 1.0 line sat ~0.3 above its
    //     0.7 baseline; the extra margin is the r14 false-positive
    //     lesson). Real plan drift under the new convention reads
    //     1.9 s+ in sweep context (old 1.3 s+ plus the 0.25 s sort +
    //     sweep overhead), still comfortably above the alarm line.
    val idleFloorSec = 0.138
    val pins = Map("q_rsi" -> 1.5)
    // normalize by the WORST probe anywhere in the sweep (r18: was
    // max of the two end probes) — contention at any point scales the
    // budget, so it can never fake a time-pin regression
    val contentionScale =
      math.max(1.0, floorProbes.max / idleFloorSec)
    val pinFailures =
      if (!sfDir.endsWith("sf0.1")) Seq.empty
      else pins.toSeq.flatMap { case (qn, budget) =>
        results.get(qn).filter(t => t >= 0 && t > budget * contentionScale)
          .map(t => "\"" + qn + "\"")
      }
    // Plan-cost pins: unlike the time pins these need NO floor
    // normalization — shuffle/input bytes and planned-stage counts
    // are functions of plan + data alone, so a breach is a plan
    // regression by construction, never contention. Budgets
    // (PlanBudgets.scala) are 1.3× an idle sf0.1 reading with a
    // 0.5 MB absolute floor (bytes) / measured + 1 (stages — a small
    // new exchange can hide under the byte floor but not from the
    // stage count); active only under the driver's exact
    // configuration (sf0.1, full sweep, default CPUs) because leaf
    // split planning — and with it map-side-combine output — is
    // parallelism-dependent.
    // The A/B knobs (reducer count, AQE off) legitimately change
    // bytes and stage counts — pins are baselined under the driver's
    // exact configuration only, so any override deactivates them
    // rather than misfiring. Budgets exist for TWO scale factors
    // (r12 ADVICE: a single-config pin missed scale-dependent plan
    // regressions — broadcast-threshold flips, AQE coalesce changes):
    // sf0.1 (the driver's bench SF) and sf0.01 (the driver's
    // correctness SF, checked by gate.sh step 5's second sweep).
    val budgetMaps: Option[(Map[String, Double], Map[String, Double], Map[String, Int])] =
      if (sfDir.endsWith("sf0.1"))
        Some((PlanBudgets.shuffleMbAtSf01, PlanBudgets.inputMbAtSf01,
          PlanBudgets.stagesAtSf01))
      else if (sfDir.endsWith("sf0.01"))
        Some((PlanBudgets.shuffleMbAtSf001, PlanBudgets.inputMbAtSf001,
          PlanBudgets.stagesAtSf001))
      else None
    val planPinsActive =
      budgetMaps.nonEmpty && only.isEmpty && cpus == "32" &&
        shufflePartitions == cpus && ioCodec == "lz4" &&
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true") == "true"
    def bytePinFailures(measured: Map[String, Double],
        budgets: Map[String, Double]): Seq[String] =
      if (!planPinsActive) Seq.empty
      else budgets.toSeq.flatMap { case (qn, budgetMb) =>
        measured.get(qn).filter(m => m >= 0 && m > budgetMb)
          .map(_ => "\"" + qn + "\"")
      }
    val shufflePinFailures =
      bytePinFailures(shuffleMb, budgetMaps.map(_._1).getOrElse(Map.empty))
    val inputPinFailures =
      bytePinFailures(inputMb, budgetMaps.map(_._2).getOrElse(Map.empty))
    val stagePinFailures =
      if (!planPinsActive) Seq.empty
      else budgetMaps.get._3.toSeq.flatMap { case (qn, budget) =>
        stageCounts.get(qn).filter(n => n >= 0 && n > budget + 1)
          .map(_ => "\"" + qn + "\"")
      }
    // failures (-1 sentinel) are excluded from the total and counted
    // separately — a failed query must not SUBTRACT from the metric.
    val failed = results.values.count(_ < 0)
    val total = results.values.filter(_ >= 0).sum
    // Disclosed cold mode (SPARK_GRAFT_BENCH_COLD=1): a second pass,
    // single run per query, releasing the shared dedup caches before
    // every query — i.e. each query pays its full input build with no
    // cross-query reuse. Reported ALONGSIDE the warm numbers so both
    // are on the record; the primary metric stays warm (matching the
    // declared warm_cache flag the driver has graded two rounds).
    val coldFields =
      if (sys.env.get("SPARK_GRAFT_BENCH_COLD").contains("1")) {
        val cold = timedPass(1, coldEachQuery = true)
        val coldTotal = cold.values.filter(_ >= 0).sum
        s""","cold_total":$coldTotal,"cold_queries":${toJson(cold)}"""
      } else ""
    val shuffleTotalMb = math.round(
      shuffleMb.values.filter(_ >= 0).sum * 1000.0) / 1000.0
    // Contention-self-normalizing engine signal (r15 verdict #4): the
    // raw total is dominated by per-stage scheduling floor that moves
    // 1.5-2x with host contention (driver 73.7 s vs judge 43.1 s on
    // byte-identical plans in r15), so cross-host raw totals are not
    // comparable. floorline_excess_sec = Σ max(0, wall − stages ×
    // floor_per_stage) charges each query only the wall ABOVE its own
    // scheduling floorline — contention inflates walls and the
    // floorline together, so the
    // excess stays put while raw totals diverge. This is the number
    // to compare across rounds/hosts; queries with a failed counting
    // run (-1 stages) conservatively contribute their full wall.
    // r18: the floorline is priced PER SEGMENT — each query uses the
    // worse of the two probes bracketing its stretch of the sweep
    // (probe k before it, probe k+1 after), so a mid-sweep burst
    // inflates the floorline exactly where it inflated the walls and
    // the excess stays the idle engine signal. Validated by a
    // deliberately bursty sweep (spinner toggled mid-sweep) reading
    // within the idle band — see SCALE.md's bench-methodology note.
    def floorPerStageFor(qn: String): Double = {
      val seg = segmentOf.getOrElse(qn, 0)
      val bracket = math.max(floorProbes(seg),
        floorProbes(math.min(seg + 1, floorProbes.size - 1)))
      bracket / 2
    }
    val floorlineExcessSec = math.round(results.toSeq.collect {
      case (qn, w) if w >= 0 =>
        val st = stageCounts.getOrElse(qn, -1)
        if (st > 0) math.max(0.0, w - st * floorPerStageFor(qn)) else w
    }.sum * 1000.0) / 1000.0
    // plan_pins_active is EMITTED (not just used): tools/gate.sh step 5
    // asserts it true so an inherited SPARK_GRAFT_CPUS/SHUFFLE/AQE
    // export can never make the gate pass vacuously with the budgets
    // silently deactivated (r12 ADVICE).
    val planPinFields = s""""plan_pins_active":$planPinsActive,"shuffle_pin_failures":[${shufflePinFailures.mkString(",")}],"input_pin_failures":[${inputPinFailures.mkString(",")}],"stage_pin_failures":[${stagePinFailures.mkString(",")}]"""
    // every interleaved reading, in sweep order — the archived
    // evidence for how each segment's floorline was priced
    val floorProbesJson = floorProbes
      .map(p => math.round(p * 1000.0) / 1000.0).mkString("[", ",", "]")
    val prebuiltJson = prebuilt.map("\"" + _ + "\"").mkString("[", ",", "]")
    val fullLine = s"""{"metric":"total","value":$total,"unit":"sec","failed":$failed,"n_queries":${results.size},"runs_per_query":$runs,"agg":"min","warm_cache":true,"prebuilt":$prebuiltJson,"floor_sec":$floorSec,"floor_per_stage_sec":${floorSec / 2},"floor_after_sec":$floorSecAfter,"floor_probes":$floorProbesJson,"floorline_excess_sec":$floorlineExcessSec,"pin_failures":[${pinFailures.mkString(",")}],$planPinFields,"shuffle_mb_total":$shuffleTotalMb$coldFields,"queries":${toJson(results)},"stages":${toJsonInt(stageCounts)},"shuffle_mb":${toJson(shuffleMb)},"input_mb":${toJson(inputMb)},"sf":"$sfDir"}"""
    println(fullLine)
    // Loss-proof copy of the FULL line (r18 verdict #1): the archived
    // BENCH_r17.json kept only the short re-emit because the full line
    // fell outside the driver's tail-capture window, which cost the
    // r18 round its entire per-query round-over-round comparison
    // (PERF_r18 n_common=0). The stdout contract is unchanged — this
    // is a side copy on disk, so the per-query map survives any
    // stdout truncation and a round can always be diffed against the
    // previous one (each round commits its closing sweep's file under
    // plans/<round>/bench/). Best-effort: a bench must never fail on
    // an unwritable evidence path.
    val fullOut = sys.env.getOrElse("SPARK_GRAFT_BENCH_JSON",
      "/tmp/graft_bench_full.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(fullOut),
      (fullLine + "\n").getBytes("UTF-8"))
    catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[bench] full-JSON side copy failed ($fullOut): $e") }
    // The full line above grew past the driver's tail-capture window in
    // round 3 and the LEADING total field was the part cut off. Re-emit
    // the headline number as a short final line so any last-N-bytes
    // capture always contains a parseable total — including BOTH pin
    // alarms, which must survive any truncation. n_queries
    // contextualizes the total across rounds: the declared set has
    // grown every round (120 in r12, 126 in r13, …), so raw
    // round-over-round totals are not comparable without it. The line must be SELF-SUFFICIENT for the archive
    // (r12 verdict: only a 2000-char tail survives, and r11/r12 lost
    // floor_sec + the wall map): it carries floor_sec,
    // floor_per_stage_sec and the 5 slowest (query, wall, stages)
    // triples, so every archived round is floor-normalizable from the
    // tail alone.
    val slowest5 = results.toSeq.filter(_._2 >= 0).sortBy(-_._2).take(5)
      .map { case (q, w) =>
        s"""["$q",$w,${stageCounts.getOrElse(q, -1)}]""" }
      .mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","failed":$failed,"n_queries":${results.size},"runs_per_query":$runs,"warm_cache":true,"prebuilt":$prebuiltJson,"floor_sec":$floorSec,"floor_per_stage_sec":${floorSec / 2},"floor_after_sec":$floorSecAfter,"floor_probes":$floorProbesJson,"floorline_excess_sec":$floorlineExcessSec,"pin_failures":[${pinFailures.mkString(",")}],$planPinFields,"shuffle_mb_total":$shuffleTotalMb,"slowest":$slowest5,"sf":"$sfDir"}""")
    spark.stop()
  }
}
