package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Window functions — SURVEY.md §2.5 (W1/W2 are the analytical heart of
  * the reference: pandas pct_change + rolling std,
  * fetch_stocks.py:213-216) plus rank-topk, tumbling-window and
  * sessionization (batch analogs of the streaming extension, §2.9).
  *
  * Every window ORDER BY includes a unique tiebreaker (SURVEY §7.3 rule
  * 7) — ties would make lag/rank nondeterministic on both engines.
  * q_window_dense_rank DEMONSTRATES tied-key rank semantics while
  * still honoring the rule: it pre-aggregates to (priority, year)
  * groups — unique within the window partition — and derives rank as
  * 1 + cumulative prior-class counts; its ORACLE is the raw-row
  * rank()/dense_rank() over the tied key (tie members share the
  * value, so that side is deterministic too).
  */
object WindowQueries {

  private val dec = DecimalType(18, 4)

  val queries: Map[String, QFn] = Map(
    // W1: pct_change per partition = x/lag(x) - 1; first row NULL.
    "q_window_lag_return" -> { (s, d) =>
      val w = Window.partitionBy(col("l_partkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      // r15: range-partition the one series exchange and read the
      // result in the window's own (key, series-order) order — the
      // FULL 4-column tuple (l_partkey, l_shipdate, l_orderkey,
      // l_linenumber) is the unique total order ((l_orderkey,
      // l_linenumber) ALONE is not unique in the testdata: 6000 rows,
      // 4599 distinct pairs at sf0.001 — keep all four sort keys or
      // the positional hash silently breaks) — so the terminal sort
      // and its chain-re-executing RangePartitioner sampling pass
      // elide (the q_bollinger pattern; oracle ORDER BY mirrored)
      t(s, d, "lineitem")
        .repartitionByRange(
          s.sessionState.conf.numShufflePartitions, col("l_partkey"))
        .select(col("l_partkey"), col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice") / lag(col("l_extendedprice"), 1).over(w) - lit(1.0)).as("ret"))
        .orderBy(col("l_partkey"), col("l_shipdate"), col("l_orderkey"),
          col("l_linenumber"))
    },

    // W2: 20-row rolling sample stddev with pandas min_periods
    // semantics (NULL until 20 rows). Computed from exact fixed-point
    // Σx / Σx² over the frame with one final double expression —
    // immune to the different frame-summation orders of the two
    // engines (Spark buffers sequentially, DuckDB uses a segment
    // tree), and to partial-aggregation order at cluster scale.
    // r15: the sums run as native-long 1e4-scaled integers (the same
    // rounding DECIMAL(18,4) made — floor(v·1e4+0.5) for v ≥ 0 —
    // but the decimal SUM buffered at DECIMAL(28,x)/(38,x) =
    // BigDecimal per frame update; 0.88 → 0.5 s). Bounds: value ≤
    // 560.21 ⇒ v_fp ≤ 5.7·10⁶, Σv_fp² over a 20-row frame ≤ 6.3·10¹⁴
    // — native long, exact in double.
    "q_window_rolling_std" -> { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val frame = w.rowsBetween(-19, 0)
      val dv = floor(col("value") * 10000.0 + 0.5).cast("long")
      val n = count(col("value")).over(frame)
      val sx = sum(dv).over(frame).cast("double") / 10000.0
      val sxx = sum(dv * dv).over(frame).cast("double") / 100000000.0
      ExtendedQueries.eventProfile(s, d)
        // r15: range-partitioned exchange + output in the window's own
        // (user_id, ts, event_id) order — unique via event_id — so the
        // terminal sort elides (the q_bollinger pattern)
        .repartitionByRange(
          s.sessionState.conf.numShufflePartitions, col("user_id"))
        .select(col("user_id"), col("event_id"), col("ts"),
          when(n >= 20,
            sqrt(greatest((sxx - sx * sx / n) / (n - lit(1)), lit(0.0)))).as("roll_std"))
        .orderBy(col("user_id"), col("ts"), col("event_id"))
    },

    // Rank per group, keep top-3 (canonical dashboard top-k) —
    // computed BELOW the window, like q_window_dense_rank: the naive
    // `rank() OVER (PARTITION BY o_orderpriority …)` has 5 distinct
    // partition values, so every orders row shuffles into 5 window
    // tasks and at 100× each task sorts 20% of the fact — the textbook
    // low-cardinality-window killer. Instead TopKAgg (a mergeable
    // k-heap TypedImperativeAggregate) keeps the per-group top-3 with
    // map-side combine — the exchange carries |groups|·k entries, not
    // |rows| — and the array POSITION is the rank: the window ORDER BY
    // includes the unique o_orderkey tiebreaker, so rank() has no
    // peers and is exactly row_number(). o_totalprice is a DOUBLE in
    // the star schema, so the heap's double score carries it verbatim
    // (no decimal re-encoding needed). Oracle unchanged: raw-row
    // rank() + filter — the same 15 rows. API-surface pairing:
    // q_topk_agg (SqlSurfaceQueries) reaches the SAME aggregate
    // through the registered `graft_top_k` SQL builder — Column API
    // here, SQL surface there, one physical shape, two declared entry
    // points.
    "q_window_rank_topk" -> { (s, d) =>
      t(s, d, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(graft.functions.TopKAgg.topK(
          col("o_totalprice"), col("o_orderkey"), 3).as("__tk"))
        .select(col("o_orderpriority"), posexplode(col("__tk")).as(Seq("__pos", "__e")))
        .select(col("o_orderpriority"),
          col("__e.id").as("o_orderkey"),
          col("__e.score").as("o_totalprice"),
          (col("__pos") + 1).cast("long").as("rnk"))
        .orderBy(col("o_orderpriority"), col("rnk"), col("o_orderkey"))
    },

    // Batch analog of a tumbling event-time window (§2.9): hourly
    // buckets via date_trunc — identical semantics to the Structured
    // Streaming `window($"ts", "1 hour")` variant in graft.streaming.
    "q_window_tumbling" -> { (s, d) =>
      ExtendedQueries.eventProfile(s, d)
        // date_trunc yields a session-tz timestamp; cast back to NTZ so
        // the written parquet matches DuckDB's timezone-less TIMESTAMP.
        .groupBy(date_trunc("hour", col("ts")).cast("timestamp_ntz").as("h"), col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("value").cast(dec)).cast("double").as("sum_v"))
        .orderBy(col("h"), col("event_type"))
    },

    // RANGE (value-based) frame — peers at equal order values are all
    // in-frame, so no tiebreaker is needed for determinism; the order
    // column goes through DECIMAL for exact cross-engine comparison.
    "q_window_range_frame" -> { (s, d) =>
      ExtendedQueries.eventProfile(s, d)
        .select(col("event_id"), col("user_id"), col("value"),
          expr("""count(*) OVER (PARTITION BY user_id
                 |               ORDER BY CAST(value AS DECIMAL(18,4))
                 |               RANGE BETWEEN 10.0 PRECEDING AND CURRENT ROW)""".stripMargin)
            .as("n_near"))
        .orderBy(col("event_id"))
    },

    // lead / ntile / first_value — the remaining analytic-function
    // family (unique window order via the o_orderkey tiebreaker).
    // r15: range-partitioned exchange + output in the window's own
    // order (the q_bollinger pattern) — the terminal sort elides.
    "q_window_lead_ntile" -> { (s, d) =>
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, d, "orders")
        .repartitionByRange(
          s.sessionState.conf.numShufflePartitions, col("o_orderpriority"))
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
          lead(col("o_totalprice"), 1).over(w).as("next_price"),
          ntile(4).over(w).cast("long").as("quartile"),
          first_value(col("o_orderkey")).over(w).as("first_key"))
        .orderBy(col("o_orderpriority"), col("o_orderdate"), col("o_orderkey"))
    },

    // rank vs dense_rank under TIES (order years within a priority —
    // every year is a tie class). Computed BELOW the window: rank of
    // a tie class over raw rows is 1 + the count of rows in PRIOR
    // classes, and dense_rank is the class's ordinal — both exact
    // over the (priority, year, n) aggregate, so the window runs over
    // |distinct pairs| (~35 rows), never the fact (the oracle spells
    // the same semantics as raw-row rank()/dense_rank() + DISTINCT).
    "q_window_dense_rank" -> { (s, d) =>
      val w = Window.partitionBy(col("o_orderpriority")).orderBy(col("yr"))
      t(s, d, "orders")
        .select(col("o_orderpriority"),
          year(col("o_orderdate")).cast("long").as("yr"))
        .groupBy(col("o_orderpriority"), col("yr"))
        .agg(count(lit(1)).as("__n"))
        .select(col("o_orderpriority"), col("yr"),
          (coalesce(sum(col("__n")).over(
            w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)) + 1L)
            .as("rk"),
          row_number().over(w).cast("long").as("drk"))
        .orderBy(col("o_orderpriority"), col("yr"))
    },

    // 30-minute-gap sessionization: lag-gap flag → running sum =
    // session index, then per-session aggregates. Integer microsecond
    // arithmetic on both engines — no float anywhere.
    "q_sessionize" -> { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val us = unix_micros(col("ts").cast("timestamp"))
      val prevUs = lag(us, 1).over(w)
      val isNew = when(prevUs.isNull || (us - prevUs) > lit(1800000000L), lit(1L)).otherwise(lit(0L))
      ExtendedQueries.eventProfile(s, d)
        .select(col("user_id"), col("event_id"), col("ts"),
          sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, 0)).as("session_id"))
        .groupBy(col("user_id"), col("session_id"))
        .agg(
          count(lit(1)).as("n_events"),
          min(col("ts")).as("t_start"),
          max(col("ts")).as("t_end"))
        .orderBy(col("user_id"), col("session_id"))
    },
  )

  val sql: Map[String, String] = Map(
    "q_window_dense_rank" ->
      """SELECT DISTINCT o_orderpriority,
        |       CAST(year(o_orderdate) AS BIGINT) AS yr,
        |       CAST(rank() OVER (PARTITION BY o_orderpriority
        |                         ORDER BY year(o_orderdate)) AS BIGINT) AS rk,
        |       CAST(dense_rank() OVER (PARTITION BY o_orderpriority
        |                               ORDER BY year(o_orderdate)) AS BIGINT) AS drk
        |FROM orders
        |ORDER BY o_orderpriority, yr""".stripMargin,

    "q_window_lag_return" ->
      """SELECT l_partkey, l_orderkey, l_linenumber,
        |       l_extendedprice / lag(l_extendedprice) OVER
        |         (PARTITION BY l_partkey ORDER BY l_shipdate, l_orderkey, l_linenumber)
        |         - 1.0 AS ret
        |FROM lineitem
        |ORDER BY l_partkey, l_shipdate, l_orderkey, l_linenumber""".stripMargin,

    "q_window_rolling_std" ->
      """WITH b AS (
        |  SELECT user_id, event_id, ts,
        |         count(value) OVER w AS n,
        |         CAST(sum(dv) OVER w AS DOUBLE) / 10000.0 AS sx,
        |         CAST(sum(dv * dv) OVER w AS DOUBLE) / 100000000.0 AS sxx
        |  FROM (SELECT *, CAST(floor(value * 10000.0 + 0.5) AS BIGINT) AS dv FROM events)
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
        |)
        |SELECT user_id, event_id, ts,
        |       CASE WHEN n >= 20
        |            THEN sqrt(greatest((sxx - sx * sx / n) / (n - 1), 0.0)) END AS roll_std
        |FROM b ORDER BY user_id, ts, event_id""".stripMargin,

    "q_window_rank_topk" ->
      """SELECT * FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |         rank() OVER (PARTITION BY o_orderpriority
        |                      ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |  FROM orders)
        |WHERE rnk <= 3
        |ORDER BY o_orderpriority, rnk, o_orderkey""".stripMargin,

    "q_window_tumbling" ->
      """SELECT date_trunc('hour', ts) AS h, event_type, count(*) AS n,
        |       CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_v
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_window_range_frame" ->
      """SELECT event_id, user_id, value,
        |       count(*) OVER (PARTITION BY user_id
        |                      ORDER BY CAST(value AS DECIMAL(18,4))
        |                      RANGE BETWEEN 10.0 PRECEDING AND CURRENT ROW) AS n_near
        |FROM events ORDER BY event_id""".stripMargin,

    "q_window_lead_ntile" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice,
        |       lead(o_totalprice, 1) OVER w AS next_price,
        |       ntile(4) OVER w AS quartile,
        |       first_value(o_orderkey) OVER w AS first_key
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_orderpriority, o_orderdate, o_orderkey""".stripMargin,

    "q_sessionize" ->
      """WITH flags AS (
        |  SELECT user_id, event_id, ts,
        |         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
        |              THEN 1 ELSE 0 END AS is_new
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), sessions AS (
        |  SELECT user_id, event_id, ts,
        |         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM flags
        |)
        |SELECT user_id, session_id, count(*) AS n_events,
        |       min(ts) AS t_start, max(ts) AS t_end
        |FROM sessions GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
  )
}
