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
  * (l_shipdate, l_orderkey, l_linenumber), price =
  * `l_extendedprice` cast to exact DECIMAL(18,2). All windowed sums /
  * maxima stay DECIMAL (partition-order independent); one double
  * division per indicator at the end (IEEE-identical cross-engine).
  * Both plans are a single hash exchange on l_partkey.
  */
object IndicatorQueries {

  val queries: Map[String, QFn] = Map(
    // Cutler's RSI-14 per part series: non-null once 14 diffs exist.
    "q_rsi" -> { (s, d) =>
      graft.ops.Indicators.rsi(
          t(s, d, "lineitem"),
          col("l_partkey"),
          Seq(col("l_shipdate"), col("l_orderkey"), col("l_linenumber")),
          col("l_extendedprice").cast("decimal(18,2)"), period = 14)
        .filter(col("rsi").isNotNull)
        .select(col("l_partkey"), col("l_orderkey"), col("l_linenumber"),
          col("rn"), col("rsi"))
        .orderBy(col("l_partkey"), col("rn"))
    },

    // Maximum drawdown per part: most negative peak-to-trough price
    // fraction; one row per part.
    "q_drawdown" -> { (s, d) =>
      graft.ops.Indicators.maxDrawdown(
          t(s, d, "lineitem"),
          col("l_partkey"),
          Seq(col("l_shipdate"), col("l_orderkey"), col("l_linenumber")),
          col("l_extendedprice").cast("decimal(18,2)"))
        .select(col("key").as("l_partkey"), col("n_obs"), col("max_drawdown"))
        .orderBy(col("l_partkey"))
    },
  )

  val sql: Map[String, String] = Map(
    "q_rsi" ->
      """WITH px AS (
        |  SELECT l_partkey, l_orderkey, l_linenumber, l_shipdate,
        |         CAST(l_extendedprice AS DECIMAL(18,2)) AS price
        |  FROM lineitem
        |), diffs AS (
        |  -- exact integer sub-cent units, mirroring the Spark plan:
        |  -- the decimal diff is integer-valued after the scale shift
        |  SELECT *,
        |    CAST(row_number() OVER w AS BIGINT) AS rn,
        |    CAST((price - lag(price, 1) OVER w) * 10000 AS BIGINT) AS diff
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

    "q_drawdown" ->
      """WITH px AS (
        |  -- exact integer sub-unit prices, mirroring the Spark plan:
        |  -- both division operands are integers < 2^53, so their
        |  -- doubles are exact and the quotient is engine-independent
        |  SELECT l_partkey, l_orderkey, l_linenumber, l_shipdate,
        |         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 10000 AS BIGINT) AS price
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
