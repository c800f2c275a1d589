package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Declared queries widening the SQL/window/array surface (SURVEY
  * §2.11, round 4): distribution window functions, ordered string
  * aggregation, FILTER-style conditional aggregates, per-group mode,
  * gaps-and-islands, UNPIVOT, a banded interval join, regex extraction
  * and higher-order array functions — the remaining relational idioms
  * an analyst coming from the reference's DuckDB dialect
  * (`streamlit/app.py:22-36`) would reach for next.
  *
  * Determinism discipline (§7.3): every ordering carries a unique
  * tiebreak; collect_list order is canonicalized with array_sort
  * before concatenation; exact sums run in DECIMAL; timestamp
  * arithmetic uses the unix_micros ↔ epoch_us integer idiom shared
  * with q_sessionize. Small-integer ratios (percent_rank/cume_dist)
  * are emitted UNROUNDED — the raw double is engine-identical, while
  * a display round hits .5 boundaries where Spark (HALF_UP) and
  * DuckDB (half-even) disagree.
  */
object SqlSurfaceQueries {

  val queries: Map[String, QFn] = Map(

    // Distribution window functions per brand: percent_rank and
    // cume_dist over retail price (unique tiebreak p_partkey), plus
    // the cheapest/priciest part ids via first/last over the full
    // frame. One hash exchange on p_brand; everything else is the
    // window sort.
    "q_window_cume" -> { (s, d) =>
      val w = Window.partitionBy(col("p_brand"))
        .orderBy(col("p_retailprice"), col("p_partkey"))
      val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      // pr/cd emitted UNROUNDED: (rank−1)/(n−1) over exact small ints
      // is the same correctly-rounded double on any engine, but a
      // 4 dp display round lands on .5 boundaries (57/800 = .07125)
      // where Spark rounds HALF_UP and DuckDB half-even — rounding
      // CREATED the only cross-engine divergence (bit sf0.1 row 18454)
      t(s, d, "part")
        .select(col("p_partkey"), col("p_brand"), col("p_retailprice"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"),
          first(col("p_partkey")).over(w).as("cheapest_id"),
          last(col("p_partkey")).over(full).as("priciest_id"))
        .orderBy(col("p_brand"), col("p_retailprice"), col("p_partkey"))
    },

    // Ordered string aggregation per nation: supplier names sorted and
    // joined. collect_list has NO deterministic order under Spark's
    // partitioning — array_sort canonicalizes before concat, which is
    // exactly the ORDER BY inside DuckDB's string_agg. Dim join is
    // broadcast; one exchange on n_name.
    "q_string_agg" -> { (s, d) =>
      t(s, d, "supplier")
        .join(broadcast(t(s, d, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_suppliers"),
          concat_ws(",", array_sort(collect_list(col("s_name")))).as("names"))
        .orderBy(col("n_name"))
    },

    // FILTER-clause conditional aggregation: one pass over lineitem,
    // every aggregate gated by its own predicate (the idiomatic
    // replacement for N self-joins). Monetary sums in exact
    // native-long CENTS (r15 — the DECIMAL(18,2) sum buffered as
    // BigDecimal per update; see q_agg_group), decoded /100.0 at the
    // DOUBLE boundary (§7.3: no DECIMAL finals — see q_unpivot).
    "q_conditional_agg" -> { (s, d) =>
      val px = floor(col("l_extendedprice") * 100.0 + 0.5).cast("long")
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n_items"),
          count(when(col("l_quantity") > 25, 1)).as("n_heavy"),
          (sum(when(col("l_discount") > 0.05, px)).cast("double") / 100.0)
            .as("sum_discounted"),
          count(when(col("l_tax") === 0.0, 1)).as("n_taxfree"))
        .orderBy(col("l_returnflag"))
    },

    // Per-group mode with a deterministic tie-break: most frequent
    // order priority per order status (ties broken by priority value).
    // Two map-side-combinable aggregations + a rank over the tiny
    // (status, priority) count table — the exchanges carry counts,
    // never order rows.
    "q_mode" -> { (s, d) =>
      val counts = t(s, d, "orders")
        .groupBy(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      counts
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("o_orderstatus"))
            .orderBy(col("n").desc, col("o_orderpriority"))))
        .filter(col("rk") === 1)
        .select(col("o_orderstatus"), col("o_orderpriority").as("mode_priority"),
          col("n").as("n_orders"))
        .orderBy(col("o_orderstatus"))
    },

    // Gaps-and-islands: runs of consecutive active DAYS per user. The
    // island key is day_number − row_number (constant within a run) —
    // the classic trick, all within one window partitioning on
    // user_id; the follow-up groupBy reuses that hash layout.
    "q_gap_islands" -> { (s, d) =>
      val day = to_date(col("ts"))
      val dayNum = datediff(day, lit("2024-01-01").cast("date")).cast("long")
      val w = Window.partitionBy(col("user_id")).orderBy(col("day_num"))
      ExtendedQueries.eventProfile(s, d)
        .select(col("user_id"), day.as("day"), dayNum.as("day_num"))
        .distinct()
        .withColumn("isl", col("day_num") - row_number().over(w))
        .groupBy(col("user_id"), col("isl"))
        .agg(min(col("day")).as("start_day"), max(col("day")).as("end_day"),
          count(lit(1)).as("n_days"))
        .select(col("user_id"), col("start_day"), col("end_day"), col("n_days"))
        .orderBy(col("user_id"), col("start_day"))
    },

    // UNPIVOT: per-flag measure columns rotated to (measure, value)
    // rows via the native unpivot API (an Expand node) — the inverse
    // of q_pivot. Sums run as exact native-long CENTS (r15 — the
    // DECIMAL(18,2) sums buffered at DECIMAL(28,2) = BigDecimal per
    // update, ~0.25 s / 600 k rows / expr; 0.65 → 0.3 s), decoded
    // /100.0 to DOUBLE finals on BOTH engines (§7.3: no DECIMAL
    // finals — a decimal reaches pandas as an object Decimal via
    // pyarrow but as float64 via DuckDB, so its string form diverges
    // on integer-valued cents: '20028.00' vs '20028.0'; the same
    // exact integer decodes to the same IEEE double on both engines).
    // Expand, not stack(): the stack() Generate node measured ~0.4 s
    // of fixed overhead per fresh plan; Expand stays inside codegen.
    "q_unpivot" -> { (s, d) =>
      val px = floor(col("l_extendedprice") * 100.0 + 0.5).cast("long")
      val qty = floor(col("l_quantity") * 100.0 + 0.5).cast("long")
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_items"), sum(qty).as("sum_qty"), sum(px).as("sum_px"))
        .select(col("l_returnflag"),
          col("n_items").cast("double").as("n_items"),
          (col("sum_qty").cast("double") / 100.0).as("sum_qty"),
          (col("sum_px").cast("double") / 100.0).as("sum_px"))
        .unpivot(Array(col("l_returnflag")),
          Array(col("n_items"), col("sum_qty"), col("sum_px")),
          "measure", "value")
        .orderBy(col("l_returnflag"), col("measure"))
    },

    // Banded interval join: for each purchase, the count of the same
    // user's clicks in the preceding hour. NOT a range-condition join
    // (which Spark would execute as a per-key cartesian with a
    // filter): each purchase explodes to its two candidate hour bins,
    // the join is an EQUI-join on (user_id, hour_bin), and the exact
    // interval predicate filters the bin-bounded candidates. At
    // 100 TB the shuffle carries each row at most twice and the pair
    // space is bounded by per-(user, hour) activity — the standard
    // time-binning contract, same family as the as-of join.
    "q_interval_join" -> { (s, d) =>
      val us = unix_micros(col("ts").cast("timestamp"))
      val hourUs = 3600L * 1000000L
      val ev = ExtendedQueries.eventProfile(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id"),
          us.as("p_us"), (us / lit(hourUs)).cast("long").as("bin0"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), us.as("c_us"),
          (us / lit(hourUs)).cast("long").as("bin"))
      purchases
        .select(col("p_id"), col("user_id"), col("p_us"),
          explode(array(col("bin0"), col("bin0") - 1)).as("bin"))
        .join(clicks, Seq("user_id", "bin"))
        .filter(col("c_us") > col("p_us") - lit(hourUs) && col("c_us") <= col("p_us"))
        .groupBy(col("p_id"))
        .agg(count(lit(1)).as("n_clicks_1h"))
        .select(col("p_id").as("event_id"), col("n_clicks_1h"))
        .orderBy(col("event_id"))
    },

    // Salted aggregation equivalence (the aggregation dual of
    // q_salt_skew_join): two-phase (key, salt) partials then merge —
    // a hot key spreads over n partial groups; the oracle is the
    // PLAIN aggregate, asserting the salting changes nothing. Sums in
    // exact DECIMAL; the avg division happens once, in double.
    "q_salt_skew_agg" -> { (s, d) =>
      graft.ops.Skew.saltedAgg(
          t(s, d, "lineitem")
            .select(col("l_returnflag"), col("l_orderkey"),
              col("l_extendedprice").cast("decimal(18,2)").as("px")),
          keys = Seq("l_returnflag"), valueCol = "px",
          saltFrom = col("l_orderkey"), n = 16)
        .select(col("l_returnflag"),
          col("sum_v").cast("double").as("sum_px"), col("cnt"),
          col("min_v").cast("double").as("min_px"),
          col("max_v").cast("double").as("max_px"),
          (col("sum_v").cast("double") / col("cnt")).as("avg_px"))
        .orderBy(col("l_returnflag"))
    },

    // SLIDING event windows: 2-hour buckets every hour — each event
    // lands in exactly two overlapping buckets (the batch twin of a
    // sliding streaming aggregation). Spark's window(slide) generates
    // the bucket fanout below the aggregate; the oracle spells the
    // same two bucket starts per row with unnest.
    "q_window_sliding" -> { (s, d) =>
      ExtendedQueries.eventProfile(s, d)
        .groupBy(window(col("ts"), "2 hours", "1 hour").as("w"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_v"))
        .select(col("w.start").cast("timestamp_ntz").as("w_start"),
          col("n"), col("sum_v"))
        .orderBy(col("w_start"))
    },

    // Engine-managed SESSION windows in batch: the same session_window
    // expression the streaming pipeline uses, oracle-verified. NB the
    // gap semantics are half-open — an event at exactly prev+30min
    // starts a NEW session (>=), unlike q_sessionize's strict-> gap;
    // the oracle mirrors session_window's rule.
    "q_session_window" -> { (s, d) =>
      ExtendedQueries.eventProfile(s, d)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), col("w.start").cast("timestamp_ntz").as("t_start"),
          col("n_events"))
        .orderBy(col("user_id"), col("t_start"))
    },

    // Date spine: a contiguous calendar generated from the data's own
    // min/max order dates — the reference's dim_date build
    // (fetch_stocks.py:165-184) as a declared query. sequence+explode
    // over the 1-row bounds aggregate: the generator output is the
    // calendar length, independent of fact-table size.
    "q_date_spine" -> { (s, d) =>
      t(s, d, "orders")
        .agg(to_date(min(col("o_orderdate"))).as("d0"),
          to_date(max(col("o_orderdate"))).as("d1"))
        .select(explode(sequence(col("d0"), col("d1"))).as("day"))
        .select(col("day"),
          year(col("day")).cast("long").as("y"),
          month(col("day")).cast("long").as("m"),
          dayofmonth(col("day")).cast("long").as("dom"))
        .orderBy(col("day"))
    },

    // Arbitrary-origin time bucketing: 90-minute buckets anchored at
    // 00:15 — integer micros arithmetic on both engines (floor to the
    // bucket start), the general form of q_window_tumbling's
    // date_trunc. Bucket id = floor((us − origin) / width).
    "q_time_bucket" -> { (s, d) =>
      val us = unix_micros(col("ts").cast("timestamp"))
      val originUs = 15L * 60 * 1000000L   // 00:15 after the epoch day
      val widthUs = 90L * 60 * 1000000L
      val bucketStart = (floor((us - lit(originUs)) / lit(widthUs)).cast("long")
        * lit(widthUs)) + lit(originUs)
      ExtendedQueries.eventProfile(s, d)
        .groupBy(timestamp_micros(bucketStart).cast("timestamp_ntz").as("bucket"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_v"))
        .orderBy(col("bucket"))
    },

    // grouping()/grouping_id() markers on a cube: the only reliable
    // way to tell a rollup-generated NULL (subtotal row) from a NULL
    // that was in the data — q_null_semantics' concern composed with
    // q_cube's. The nullable key (nullif on tax) makes the ambiguity
    // real: without the marker, the data-null group and the subtotal
    // row print identically.
    "q_grouping_id" -> { (s, d) =>
      t(s, d, "lineitem")
        // key computed BELOW the cube: grouping(col) must reference a
        // grouping column verbatim, so an expression key needs a name
        .select(col("l_returnflag"), expr("nullif(l_tax, 0.0)").as("tax_key"))
        // two-level cube (helper scaladoc): the ×4 Expand multiplies
        // |groups|, not the fact; grouping() markers come from the
        // OUTER cube and are identical.
        .transform(df => twoLevelCube(df,
          Seq(col("l_returnflag"), col("tax_key")))(
          inner = Seq(count(lit(1)).as("__n")),
          outer = Seq(sum(col("__n")).as("n"),
            grouping(col("l_returnflag")).cast("long").as("g_flag"),
            grouping(col("tax_key")).cast("long").as("g_tax"))))
        .orderBy(col("g_flag"), col("g_tax"),
          asc_nulls_first("l_returnflag"), asc_nulls_first("tax_key"))
    },

    // Null semantics in one query: a nullable group key (nulls form
    // ONE group on both engines), a null-safe equality join
    // (<=> ⟺ IS NOT DISTINCT FROM — planned as a hash join on the
    // coalesced key, not a nested loop), and explicit NULLS FIRST
    // ordering (Spark defaults nulls-first ascending, DuckDB
    // nulls-last — never rely on either default).
    "q_null_semantics" -> { (s, d) =>
      val li = t(s, d, "lineitem")
      val a = li.groupBy(expr("nullif(l_tax, 0.0)").as("tax_key"))
        .agg(count(lit(1)).as("n_all"))
      val b = li.filter(col("l_quantity") > 25)
        .groupBy(expr("nullif(l_tax, 0.0)").as("tax_key2"))
        .agg(count(lit(1)).as("n_heavy"))
      a.join(b, col("tax_key") <=> col("tax_key2"), "left")
        .select(col("tax_key"), col("n_all"), col("n_heavy"))
        .orderBy(asc_nulls_first("tax_key"))
    },

    // Exact per-group top-k WITHOUT a sort window: the mergeable
    // k-heap aggregate (graft.functions.TopKAgg). The rank-window
    // idiom shuffles and sorts every row of every group; this plan's
    // exchange carries one O(k) heap per group from each map task —
    // the shape that survives a 100× scale-up. The oracle IS the
    // rank window, asserting exact equivalence. Since r9 this is the
    // SQL-SURFACE twin of q_window_rank_topk (which took over the
    // Column-API TopKAgg form when its rank window was re-planned):
    // the same physical aggregate reached through the registered
    // `graft_top_k` builder — the declared coverage for TopKAgg.build
    // and its analysis-time input coercion.
    "q_topk_agg" -> { (s, d) =>
      graft.functions.GraftFunctions.register(s)
      t(s, d, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(expr("graft_top_k(o_totalprice, o_orderkey, 3)").as("top"))
        .select(col("o_orderpriority"), posexplode(col("top")))
        .select(col("o_orderpriority"), (col("pos") + 1).cast("long").as("rk"),
          col("col.id").as("o_orderkey"), col("col.score").as("o_totalprice"))
        .orderBy(col("o_orderpriority"), col("rk"))
    },

    // Regex extraction over documents: capitalized-word matches via a
    // pattern whose semantics agree between java.util.regex and RE2
    // (plain character classes, no backtracking constructs). Row-local
    // expressions; no shuffle except the output sort.
    "q_regex_extract" -> { (s, d) =>
      val caps = regexp_extract_all(col("text"), lit("[A-Z][a-z]+"), lit(0))
      t(s, d, "documents")
        .select(col("doc_id"),
          size(caps).cast("long").as("n_caps"),
          when(size(caps) > 0, element_at(caps, 1)).as("first_cap"))
        .orderBy(col("doc_id"))
    },

    // Higher-order array functions on embeddings: reverse-dot via
    // zip_with + sequential aggregate fold — the declarative
    // (non-kernel) path, exercising Spark's lambda expressions against
    // DuckDB's list_transform/list_sum. Both engines fold the 64
    // products left-to-right, so the double result is bit-identical
    // before the display rounding.
    "q_array_zip" -> { (s, d) =>
      val v = col("embedding").cast("array<double>")
      val rdot = aggregate(
        zip_with(v, reverse(v), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x)
      t(s, d, "embeddings")
        .select(col("vec_id"), round(rdot, 4).as("rdot"))
        .orderBy(col("vec_id"))
    },
  )

  val sql: Map[String, String] = Map(
    "q_window_cume" ->
      """SELECT p_partkey, p_brand, p_retailprice,
        |       percent_rank() OVER w AS pr,
        |       cume_dist() OVER w AS cd,
        |       first_value(p_partkey) OVER w AS cheapest_id,
        |       last_value(p_partkey) OVER
        |         (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |         AS priciest_id
        |FROM part
        |WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey)
        |ORDER BY p_brand, p_retailprice, p_partkey""".stripMargin,

    "q_string_agg" ->
      """SELECT n_name, count(*) AS n_suppliers,
        |       string_agg(s_name, ',' ORDER BY s_name) AS names
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q_conditional_agg" ->
      """SELECT l_returnflag,
        |       count(*) AS n_items,
        |       count(*) FILTER (WHERE l_quantity > 25) AS n_heavy,
        |       CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT))
        |         FILTER (WHERE l_discount > 0.05) AS DOUBLE) / 100.0 AS sum_discounted,
        |       count(*) FILTER (WHERE l_tax = 0.0) AS n_taxfree
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_mode" ->
      """SELECT o_orderstatus, o_orderpriority AS mode_priority, n AS n_orders
        |FROM (
        |  SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |         row_number() OVER (PARTITION BY o_orderstatus
        |                            ORDER BY count(*) DESC, o_orderpriority) AS rk
        |  FROM orders GROUP BY o_orderstatus, o_orderpriority
        |)
        |WHERE rk = 1 ORDER BY o_orderstatus""".stripMargin,

    "q_gap_islands" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day,
        |         date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day_num
        |  FROM events
        |), isl AS (
        |  SELECT user_id, day, day_num,
        |         day_num - row_number() OVER (PARTITION BY user_id ORDER BY day_num) AS isl
        |  FROM days
        |)
        |SELECT user_id, min(day) AS start_day, max(day) AS end_day,
        |       count(*) AS n_days
        |FROM isl GROUP BY user_id, isl
        |ORDER BY user_id, start_day""".stripMargin,

    "q_unpivot" ->
      """WITH agg AS (
        |  SELECT l_returnflag, count(*) AS n_items,
        |         sum(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT)) AS sum_qty,
        |         sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS sum_px
        |  FROM lineitem GROUP BY l_returnflag
        |)
        |SELECT l_returnflag, measure, value FROM (
        |  SELECT l_returnflag, 'n_items' AS measure,
        |         CAST(n_items AS DOUBLE) AS value FROM agg
        |  UNION ALL
        |  SELECT l_returnflag, 'sum_qty', CAST(sum_qty AS DOUBLE) / 100.0 FROM agg
        |  UNION ALL
        |  SELECT l_returnflag, 'sum_px', CAST(sum_px AS DOUBLE) / 100.0 FROM agg
        |)
        |ORDER BY l_returnflag, measure""".stripMargin,

    "q_interval_join" ->
      """WITH p AS (
        |  SELECT event_id AS p_id, user_id, epoch_us(ts) AS p_us
        |  FROM events WHERE event_type = 'purchase'
        |), c AS (
        |  SELECT user_id, epoch_us(ts) AS c_us
        |  FROM events WHERE event_type = 'click'
        |)
        |SELECT p_id AS event_id, count(*) AS n_clicks_1h
        |FROM p JOIN c ON p.user_id = c.user_id
        |              AND c.c_us > p.p_us - 3600000000
        |              AND c.c_us <= p.p_us
        |GROUP BY p_id ORDER BY event_id""".stripMargin,

    "q_salt_skew_agg" ->
      """SELECT l_returnflag,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_px,
        |       count(l_extendedprice) AS cnt,
        |       CAST(min(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS min_px,
        |       CAST(max(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS max_px,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |         / count(l_extendedprice) AS avg_px
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_window_sliding" ->
      """WITH fan AS (
        |  SELECT u.w_start, value FROM events,
        |    unnest([date_trunc('hour', ts),
        |            date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS u(w_start)
        |)
        |SELECT w_start, count(*) AS n,
        |       CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_v
        |FROM fan GROUP BY w_start ORDER BY w_start""".stripMargin,

    "q_session_window" ->
      """WITH flags AS (
        |  SELECT user_id, event_id, ts,
        |         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000
        |              THEN 1 ELSE 0 END AS is_new
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), sess AS (
        |  SELECT user_id, ts,
        |         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                           ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM flags
        |)
        |SELECT user_id, min(ts) AS t_start, count(*) AS n_events
        |FROM sess GROUP BY user_id, sid
        |ORDER BY user_id, t_start""".stripMargin,

    "q_date_spine" ->
      """WITH b AS (
        |  SELECT CAST(min(o_orderdate) AS DATE) AS d0,
        |         CAST(max(o_orderdate) AS DATE) AS d1
        |  FROM orders
        |)
        |SELECT CAST(u.day AS DATE) AS day,
        |       CAST(year(u.day) AS BIGINT) AS y,
        |       CAST(month(u.day) AS BIGINT) AS m,
        |       CAST(day(u.day) AS BIGINT) AS dom
        |FROM b, unnest(generate_series(b.d0, b.d1, INTERVAL 1 DAY)) AS u(day)
        |ORDER BY day""".stripMargin,

    "q_time_bucket" ->
      """SELECT epoch_ms(((epoch_us(ts) - 900000000) // 5400000000)
        |         * 5400000 + 900000) AS bucket,
        |       count(*) AS n,
        |       CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_v
        |FROM events
        |GROUP BY 1 ORDER BY bucket""".stripMargin,

    "q_grouping_id" ->
      """SELECT l_returnflag, nullif(l_tax, 0.0) AS tax_key, count(*) AS n,
        |       CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
        |       CAST(grouping(nullif(l_tax, 0.0)) AS BIGINT) AS g_tax
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, nullif(l_tax, 0.0))
        |ORDER BY g_flag, g_tax, l_returnflag NULLS FIRST, tax_key NULLS FIRST""".stripMargin,

    "q_null_semantics" ->
      """WITH a AS (
        |  SELECT nullif(l_tax, 0.0) AS tax_key, count(*) AS n_all
        |  FROM lineitem GROUP BY 1
        |), b AS (
        |  SELECT nullif(l_tax, 0.0) AS tax_key2, count(*) AS n_heavy
        |  FROM lineitem WHERE l_quantity > 25 GROUP BY 1
        |)
        |SELECT tax_key, n_all, n_heavy
        |FROM a LEFT JOIN b ON a.tax_key IS NOT DISTINCT FROM b.tax_key2
        |ORDER BY tax_key NULLS FIRST""".stripMargin,

    "q_topk_agg" ->
      """SELECT o_orderpriority, rk, o_orderkey, o_totalprice FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_orderpriority
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders
        |)
        |WHERE rk <= 3 ORDER BY o_orderpriority, rk""".stripMargin,

    "q_regex_extract" ->
      """SELECT doc_id,
        |       len(regexp_extract_all(text, '[A-Z][a-z]+')) AS n_caps,
        |       CASE WHEN len(regexp_extract_all(text, '[A-Z][a-z]+')) > 0
        |            THEN regexp_extract_all(text, '[A-Z][a-z]+')[1] END AS first_cap
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_array_zip" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |)
        |SELECT vec_id,
        |       round(list_sum(list_transform(range(1, 65),
        |             k -> v[k] * v[65 - k])), 4) AS rdot
        |FROM e ORDER BY vec_id""".stripMargin,
  )
}
