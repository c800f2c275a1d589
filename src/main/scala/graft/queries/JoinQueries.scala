package graft.queries

import org.apache.spark.sql.functions._

/** The six declared join forms — SURVEY.md §2.3 (J1–J5 + semi/anti ext).
  *
  * Replicates the reference's star-schema joins (fetch_stocks.py:237-240)
  * Spark-first: small dimension sides are broadcast (Catalyst does this
  * automatically under autoBroadcastJoinThreshold; `broadcast()` hints
  * pin it where the dimension is provably tiny), so at 100 TB the fact
  * table never shuffles for a dim join.
  */
object JoinQueries {

  val queries: Map[String, QFn] = Map(
    // J1: inner equi-join fact→dim; dim (customer) broadcasts.
    "q_join_inner_equi" -> { (s, d) =>
      val o = t(s, d, "orders")
      val c = t(s, d, "customer")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .select(o("o_orderkey"), c("c_custkey"), c("c_name"), c("c_mktsegment"), o("o_totalprice"))
        .orderBy(col("o_orderkey"))
    },

    // J2: join through an md5 surrogate key computed on both sides
    // (the reference's MD5(Ticker) = IndexKey pattern).
    "q_join_hashkey" -> { (s, d) =>
      val o = t(s, d, "orders")
      val dim = t(s, d, "customer")
        .select(md5(col("c_custkey").cast("string").cast("binary")).as("ckey"), col("c_name"))
      o.join(broadcast(dim), md5(col("o_custkey").cast("string").cast("binary")) === col("ckey"))
        .select(col("o_orderkey"), col("ckey"), col("c_name"))
        .orderBy(col("o_orderkey"))
    },

    // J3: LEFT JOIN on a derived (year) key against a pre-aggregated
    // side; the ≤1998 filter guarantees NULL-padded rows exist.
    // Aggregating the right side to one row per year BEFORE the join
    // keeps the join 1:1 (no fanout) and the right side broadcastable.
    "q_join_left_year" -> { (s, d) =>
      val oy = t(s, d, "orders")
        .filter(year(col("o_orderdate")) <= 1998)
        .groupBy(year(col("o_orderdate")).cast("long").as("yr"))
        .agg(count(lit(1)).as("n_orders"))
      t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          year(col("l_shipdate")).cast("long").as("ship_yr"))
        .join(broadcast(oy), col("ship_yr") === col("yr"), "left")
        .select(col("l_orderkey"), col("l_linenumber"), col("ship_yr"), col("n_orders"))
        // (l_orderkey, l_linenumber) is not unique — order by every
        // projected column (NULLS FIRST to match Spark's ASC default).
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("ship_yr"),
          asc_nulls_first("n_orders"))
    },

    // J4: constant-predicate join ≅ cross join with a filtered 1-row
    // dim → BroadcastNestedLoopJoin (the reference's DimCountry join).
    "q_join_broadcast_const" -> { (s, d) =>
      t(s, d, "nation")
        .crossJoin(broadcast(t(s, d, "region").filter(col("r_name") === "EUROPE")))
        .select(col("n_nationkey"), col("n_name"), col("r_name"))
        .orderBy(col("n_nationkey"))
    },

    // Semi join: customers with ≥1 urgent order (EXISTS).
    "q_join_semi" -> { (s, d) =>
      val c = t(s, d, "customer")
      val urgent = t(s, d, "orders").filter(col("o_orderpriority") === "1-URGENT")
      c.join(urgent, c("c_custkey") === urgent("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },

    // Full outer: reconcile two independently-aggregated activity
    // views whose key domains only partially overlap (event users vs
    // a custkey subset) — unmatched rows survive on BOTH sides. Both
    // inputs are pre-aggregated, so the outer join's exchanges carry
    // |groups|, never raw rows (the same discipline as the set ops);
    // full outer cannot broadcast, so this is the one declared join
    // that MUST shuffle both sides — by design.
    "q_join_full_outer" -> { (s, d) =>
      val a = t(s, d, "events")
        .groupBy(col("user_id")).agg(count(lit(1)).as("n_events"))
      val b = t(s, d, "orders")
        .filter(col("o_custkey") % 3 === 0)
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
      a.join(b, a("user_id") === b("o_custkey"), "full_outer")
        .select(coalesce(col("user_id"), col("o_custkey")).as("id"),
          col("n_events"), col("n_orders"))
        .orderBy(col("id"))
    },

    // Anti join: customers with no high-value order (NOT EXISTS).
    "q_join_anti" -> { (s, d) =>
      val c = t(s, d, "customer")
      val big = t(s, d, "orders").filter(col("o_totalprice") > 450000.0)
      c.join(big, c("c_custkey") === big("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },

    // As-of join (pandas merge_asof / DuckDB ASOF JOIN): attribute
    // every event to the user's most recent purchase at or before it.
    // Spark has no built-in — graft.ops.AsOfJoin implements it as
    // union + ordered window (ONE shuffle of |L|+|R| on the key, no
    // range-join fanout). Right side pre-deduped per (user_id, ts)
    // keeping max event_id, so the match is deterministic.
    "q_asof_join" -> { (s, d) =>
      val e = ExtendedQueries.eventProfile(s, d)
      val p = e.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts").as("pts"))
        .agg(max(col("event_id")).as("pid"))
        .select(col("user_id"), col("pts"), col("pid"))
      graft.ops.AsOfJoin.backward(
          e.select(col("event_id"), col("user_id"), col("ts")), p,
          keys = Seq("user_id"), leftTs = "ts", rightTs = "pts",
          payload = Seq("pid", "pts"))
        .select(col("event_id"), col("user_id"), col("ts"),
          col("asof_pid").as("last_purchase_id"),
          col("asof_pts").as("last_purchase_ts"),
          (unix_micros(col("ts").cast("timestamp")) -
            unix_micros(col("asof_pts").cast("timestamp"))).as("us_since_purchase"))
        .orderBy(col("event_id"))
    },

    // FORWARD as-of with tolerance: for every event, the user's next
    // purchase within one hour (earliest purchase ts ≥ event ts, else
    // null). Same union+window single-shuffle plan as the backward
    // declared query — the direction flips the scan order, the
    // tolerance nulls stale matches; no range fanout either way. The
    // oracle expresses the identical contract as a LATERAL top-1.
    "q_asof_forward" -> { (s, d) =>
      val e = ExtendedQueries.eventProfile(s, d)
      val p = e.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts").cast("timestamp").as("pts"))
        .agg(max(col("event_id")).as("pid"))
        .select(col("user_id"), col("pts"), col("pid"))
      graft.ops.AsOfJoin.forward(
          e.select(col("event_id"), col("user_id"),
            col("ts").cast("timestamp").as("ts")), p,
          keys = Seq("user_id"), leftTs = "ts", rightTs = "pts",
          payload = Seq("pid", "pts"),
          toleranceMicros = Some(3600L * 1000000L))
        .select(col("event_id"), col("user_id"),
          col("ts").cast("timestamp_ntz").as("ts"),
          col("asof_pid").as("next_purchase_id"),
          col("asof_pts").cast("timestamp_ntz").as("next_purchase_ts"))
        .orderBy(col("event_id"))
    },

    // Salted skew join: lineitem ⋈ 3-row returnflag profile on the
    // HOT key l_returnflag (3 values → without salting, 3 reducers
    // own the whole shuffle). graft.ops.Skew.saltedJoin spreads each
    // hot key over salt partitions; result rows are identical to the
    // plain join (the oracle), declaring the technique through the
    // equivalence property, like q_bloom_prune_join. The declared
    // query runs UN-forced: at bench scale Catalyst correctly
    // broadcasts the tiny replicated dim (the plan you'd want), and
    // the salted SHUFFLE shape — the 100 TB case where the dim
    // exceeds the broadcast threshold — is separately plan-gated in
    // SkewSpec ("forceShuffle: plan shuffles on (key, salt)"). All
    // arithmetic is exact — native-long CENTS (r15: the DECIMAL(18,2)
    // form paid a BigDecimal sum buffer plus a per-row wide-decimal
    // cross-multiply, 0.86 → ~0.5 s; px_c ≤ 10⁷ × n_flag ≤ 6·10⁵ keeps
    // the product ≤ 6·10¹² in int64, and scaling BOTH sides of the
    // comparison by 100 leaves it exactly equivalent) — the join
    // enriches each row with its flag's totals and counts rows priced
    // above their flag's mean via the cross-multiplied comparison.
    "q_salt_skew_join" -> { (s, d) =>
      val li = t(s, d, "lineitem")
        .select(col("l_returnflag"), col("l_orderkey"),
          floor(col("l_extendedprice") * 100.0 + 0.5).cast("long").as("px"))
      val dim = li.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_flag"), sum(col("px")).as("s_flag"))
      graft.ops.Skew.saltedJoin(
          li, dim, key = "l_returnflag",
          saltFrom = col("l_orderkey"), n = 4)
        // px > mean(flag)  ⟺  px * n_flag > sum(flag): exact decimal
        // cross-multiplication — no division anywhere
        .select(col("l_returnflag"),
          when(col("px") * col("n_flag") > col("s_flag"), 1)
            .otherwise(0).as("above"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("above")).cast("long").as("n_above_avg"))
        .orderBy(col("l_returnflag"))
    },
  )

  val sql: Map[String, String] = Map(
    "q_join_full_outer" ->
      """WITH a AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
        |           FROM events GROUP BY user_id),
        |b AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders
        |      FROM orders WHERE o_custkey % 3 = 0 GROUP BY o_custkey)
        |SELECT coalesce(user_id, o_custkey) AS id, n_events, n_orders
        |FROM a FULL OUTER JOIN b ON user_id = o_custkey
        |ORDER BY id""".stripMargin,

    "q_join_inner_equi" ->
      """SELECT o.o_orderkey, c.c_custkey, c.c_name, c.c_mktsegment, o.o_totalprice
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |ORDER BY o.o_orderkey""".stripMargin,

    "q_join_hashkey" ->
      """SELECT o.o_orderkey, dim.ckey, dim.c_name
        |FROM orders o
        |JOIN (SELECT md5(CAST(c_custkey AS VARCHAR)) AS ckey, c_name FROM customer) dim
        |  ON md5(CAST(o.o_custkey AS VARCHAR)) = dim.ckey
        |ORDER BY o.o_orderkey""".stripMargin,

    "q_join_left_year" ->
      """SELECT l.l_orderkey, l.l_linenumber, year(l.l_shipdate) AS ship_yr, oy.n_orders
        |FROM lineitem l
        |LEFT JOIN (SELECT year(o_orderdate) AS yr, count(*) AS n_orders
        |           FROM orders WHERE year(o_orderdate) <= 1998 GROUP BY 1) oy
        |  ON year(l.l_shipdate) = oy.yr
        |ORDER BY l.l_orderkey, l.l_linenumber, ship_yr, n_orders NULLS FIRST""".stripMargin,

    "q_join_broadcast_const" ->
      """SELECT n.n_nationkey, n.n_name, r.r_name
        |FROM nation n JOIN region r ON r.r_name = 'EUROPE'
        |ORDER BY n.n_nationkey""".stripMargin,

    "q_join_semi" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,

    "q_join_anti" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000.0)
        |ORDER BY c_custkey""".stripMargin,

    "q_asof_join" ->
      """WITH p AS (
        |  SELECT user_id, ts AS pts, max(event_id) AS pid
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
        |)
        |SELECT e.event_id, e.user_id, e.ts,
        |       p.pid AS last_purchase_id, p.pts AS last_purchase_ts,
        |       epoch_us(e.ts) - epoch_us(p.pts) AS us_since_purchase
        |FROM events e ASOF LEFT JOIN p
        |  ON e.user_id = p.user_id AND e.ts >= p.pts
        |ORDER BY e.event_id""".stripMargin,

    "q_asof_forward" ->
      """WITH p AS (
        |  SELECT user_id, ts AS pts, max(event_id) AS pid
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
        |)
        |SELECT e.event_id, e.user_id, e.ts,
        |       nxt.pid AS next_purchase_id, nxt.pts AS next_purchase_ts
        |FROM events e LEFT JOIN LATERAL (
        |  SELECT pid, pts FROM p
        |  WHERE p.user_id = e.user_id AND p.pts >= e.ts
        |    AND epoch_us(p.pts) - epoch_us(e.ts) <= 3600000000
        |  ORDER BY p.pts LIMIT 1
        |) nxt ON true
        |ORDER BY e.event_id""".stripMargin,

    // The plain (unsalted) join — salting must not change a row.
    "q_salt_skew_join" ->
      """WITH li AS (
        |  SELECT l_returnflag, CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS px
        |  FROM lineitem
        |), dim AS (
        |  SELECT l_returnflag AS rf, count(*) AS n_flag, sum(px) AS s_flag
        |  FROM li GROUP BY 1
        |)
        |SELECT l.l_returnflag, count(*) AS n_items,
        |       CAST(sum(CASE WHEN l.px * d.n_flag > d.s_flag THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_above_avg
        |FROM li l JOIN dim d ON l.l_returnflag = d.rf
        |GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
