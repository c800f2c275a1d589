package graft.queries

import org.apache.spark.sql.functions._

/** Declared technical-indicator queries (SURVEY §2.11 extension):
  * RSI and maximum drawdown over per-part price series — the
  * indicator layer the reference's dashboard sits one step away from
  * (it already computes daily returns and rolling volatility in the
  * star build; RSI/drawdown are the canonical next two).
  *
  * Series definition shared by both queries (and their oracles):
  * lineitem rows per `l_partkey`, ordered by the unique total order
  * (l_shipdate, l_orderkey, l_linenumber). Prices enter the windowed
  * arithmetic as exact INTEGER sub-units `floor(price·10⁴ + 0.5)` —
  * three IEEE-identical double ops mirrored VERBATIM in the oracle
  * SQL, exact for any price of decimal scale ≤ 4 below 2⁵¹ (the money
  * precondition Indicators documents; l_extendedprice is 2-dp). All
  * windowed sums / maxima run native-long (partition-order
  * independent); one double division per indicator at the end
  * (IEEE-identical cross-engine). r9 note: the earlier
  * DECIMAL(18,2)-cast formulation computed the same integers but paid
  * a BigDecimal allocation per row on the Spark side (~0.13 s of the
  * query at sf0.1) — the floor form is the same contract without the
  * allocation, and the oracle now spells the identical expression
  * instead of a decimal chain that merely evaluates equal.
  * Every plan here is a SINGLE range exchange on l_partkey with the
  * terminal sort elided (rsi joined bollinger/drawdown's r15
  * one-exchange form in r18).
  */
object IndicatorQueries {

  val queries: Map[String, QFn] = Map(
    // Cutler's RSI-14 per part series: rows where 14 diffs exist.
    // completeOnly = the defined-rows filter runs as two native-long
    // comparisons BEFORE the round projection (a rsi.isNotNull filter
    // would inline the whole CASE incl. round() per input row — see
    // Indicators.rsi scaladoc).
    "q_rsi" -> { (s, d) =>
      graft.ops.Indicators.rsi(
          t(s, d, "lineitem"),
          col("l_partkey"),
          Seq(col("l_shipdate"), col("l_orderkey"), col("l_linenumber")),
          col("l_extendedprice"), period = 14,
          completeOnly = true,
          rangeExchange = true)
        .select(col("l_partkey"), col("l_orderkey"), col("l_linenumber"),
          col("rn"), col("rsi"))
        // ordered by the series keys themselves, not (key, rn): the
        // SAME total order (rn is row_number over exactly this order
        // and the defined-rows filter preserves its monotonicity), but
        // expressed so Catalyst can SEE it equals the window child's
        // output ordering over rsi's range-partitioned exchange — the
        // terminal sort and its second range exchange elide entirely
        // (r18; isolated min-of-9 1.09 → 0.70 s, shuffle 21.4 → 15.2
        // MB, stages 8 → 4 at sf0.1. The r9 "fused" disposition that
        // measured 0.88 s predated this elision and planned BOTH range
        // exchanges). The oracle keeps ORDER BY l_partkey, rn:
        // identical row order, positional hash unaffected — the
        // q_bollinger r15 precedent.
        .orderBy(col("l_partkey"), col("l_shipdate"), col("l_orderkey"),
          col("l_linenumber"))
    },

    // Bollinger bands per part series (fetch_stocks.py:216's rolling
    // stddev one step further — the standard mean ± 2σ envelope,
    // completing the indicator trio): 20-row SMA of price ± 2·sample
    // stddev, min_periods semantics via the completeOnly-style rn
    // filter. Prices enter as exact integer CENTS (floor(x·10²+0.5) —
    // the l_extendedprice column is 2-dp, and cents keep Σp² < 2⁵³ so
    // every sum stays native-long and every final double op is
    // mirrored IEEE-identically; see Indicators.bollinger).
    "q_bollinger" -> { (s, d) =>
      graft.ops.Indicators.bollinger(
          t(s, d, "lineitem"),
          col("l_partkey"),
          Seq(col("l_shipdate"), col("l_orderkey"), col("l_linenumber")),
          col("l_extendedprice"), period = 20, k = 2.0)
        .select(col("l_partkey"), col("l_orderkey"), col("l_linenumber"),
          col("rn"), col("mid"), col("upper"), col("lower"))
        // ordered by the series keys themselves, not (key, rn): the
        // SAME total order (rn is row_number over exactly this order,
        // and the rn >= period filter preserves its monotonicity), but
        // expressed so Catalyst can SEE it equals the window child's
        // output ordering over bollinger's range-partitioned exchange
        // — the terminal sort and its plan-re-executing sampling pass
        // elide entirely (the oracle keeps ORDER BY key, rn: identical
        // row order, positional hash unaffected)
        .orderBy(col("l_partkey"), col("l_shipdate"), col("l_orderkey"),
          col("l_linenumber"))
    },

    // Maximum drawdown per part: most negative peak-to-trough price
    // fraction; one row per part.
    "q_drawdown" -> { (s, d) =>
      graft.ops.Indicators.maxDrawdown(
          t(s, d, "lineitem"),
          col("l_partkey"),
          Seq(col("l_shipdate"), col("l_orderkey"), col("l_linenumber")),
          col("l_extendedprice"))
        .select(col("key").as("l_partkey"), col("n_obs"), col("max_drawdown"))
        .orderBy(col("l_partkey"))
    },
  )

  val sql: Map[String, String] = Map(
    "q_rsi" ->
      """WITH px AS (
        |  -- exact integer sub-unit prices, the VERBATIM expression of
        |  -- the Spark plan: floor(x*1e4 + 0.5) is three IEEE double
        |  -- ops, identical on any engine, and exact for scale-<=4
        |  -- money below 2^51
        |  SELECT l_partkey, l_orderkey, l_linenumber, l_shipdate,
        |         CAST(floor(l_extendedprice * 10000 + 0.5) AS BIGINT) AS p
        |  FROM lineitem
        |), diffs AS (
        |  SELECT *,
        |    CAST(row_number() OVER w AS BIGINT) AS rn,
        |    p - lag(p, 1) OVER w AS diff
        |  FROM px
        |  WINDOW w AS (PARTITION BY l_partkey
        |               ORDER BY l_shipdate, l_orderkey, l_linenumber)
        |), sums AS (
        |  SELECT *,
        |    sum(greatest(diff, 0)) OVER f AS sum_g,
        |    sum(greatest(-diff, 0)) OVER f AS sum_l
        |  FROM diffs
        |  WINDOW f AS (PARTITION BY l_partkey
        |               ORDER BY l_shipdate, l_orderkey, l_linenumber
        |               ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
        |)
        |SELECT l_partkey, l_orderkey, l_linenumber, rn,
        |       round(100.0 * CAST(sum_g AS DOUBLE) /
        |             CAST(sum_g + sum_l AS DOUBLE), 4) AS rsi
        |FROM sums
        |WHERE rn >= 15 AND (sum_g + sum_l) > 0
        |ORDER BY l_partkey, rn""".stripMargin,

    "q_bollinger" ->
      """WITH px AS (
        |  -- exact integer CENTS, the VERBATIM expression of the Spark
        |  -- plan: floor(x*100 + 0.5) is three IEEE double ops, exact
        |  -- for 2-dp money; 20·p² stays below 2^53 so both frame sums
        |  -- are exact native integers and their doubles are exact
        |  SELECT l_partkey, l_orderkey, l_linenumber, l_shipdate,
        |         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS p
        |  FROM lineitem
        |), sums AS (
        |  SELECT l_partkey, l_orderkey, l_linenumber,
        |    CAST(row_number() OVER w AS BIGINT) AS rn,
        |    CAST(sum(p) OVER f AS DOUBLE) AS sx,
        |    CAST(sum(p * p) OVER f AS DOUBLE) AS sxx
        |  FROM px
        |  WINDOW w AS (PARTITION BY l_partkey
        |               ORDER BY l_shipdate, l_orderkey, l_linenumber),
        |         f AS (PARTITION BY l_partkey
        |               ORDER BY l_shipdate, l_orderkey, l_linenumber
        |               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
        |)
        |SELECT l_partkey, l_orderkey, l_linenumber, rn,
        |       (sx / 20.0) / 100.0 AS mid,
        |       (sx / 20.0 + 2.0 * sqrt(greatest(
        |          (sxx - sx * sx / 20.0) / 19.0, 0.0))) / 100.0 AS upper,
        |       (sx / 20.0 - 2.0 * sqrt(greatest(
        |          (sxx - sx * sx / 20.0) / 19.0, 0.0))) / 100.0 AS lower
        |FROM sums
        |WHERE rn >= 20
        |ORDER BY l_partkey, rn""".stripMargin,

    "q_drawdown" ->
      """WITH px AS (
        |  -- exact integer sub-unit prices, the VERBATIM expression of
        |  -- the Spark plan (floor(x*1e4+0.5): three IEEE double ops);
        |  -- both division operands are integers < 2^53, so their
        |  -- doubles are exact and the quotient is engine-independent
        |  SELECT l_partkey, l_orderkey, l_linenumber, l_shipdate,
        |         CAST(floor(l_extendedprice * 10000 + 0.5) AS BIGINT) AS price
        |  FROM lineitem
        |), dd AS (
        |  SELECT l_partkey,
        |    CAST(price AS DOUBLE) /
        |    CAST(max(price) OVER (PARTITION BY l_partkey
        |                          ORDER BY l_shipdate, l_orderkey, l_linenumber
        |                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |         AS DOUBLE) - 1.0 AS frac
        |  FROM px
        |)
        |SELECT l_partkey, count(*) AS n_obs,
        |       round(min(frac), 4) AS max_drawdown
        |FROM dd GROUP BY l_partkey
        |ORDER BY l_partkey""".stripMargin,
  )
}
