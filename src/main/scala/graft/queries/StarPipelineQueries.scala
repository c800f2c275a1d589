package graft.queries

import org.apache.spark.sql.functions._

import graft.etl.StarSchemaBuilder

/** The reference's own star-schema pipeline END TO END under the
  * DuckDB oracle (reference-parity capstone, r14): every stage of
  * `fetch_stocks.py:165-241` — DimDate via union-distinct with the
  * derived year/month/weekend columns, the md5(ticker) surrogate-key
  * dimension with its CASE display names (the IndexName/IndexCode
  * column mix-up and the display-string spellings are intentionally
  * fixed — see StarSchemaBuilder's header deviation note; the oracle
  * CTE mirrors the FIXED mapping), the constant DimCountry,
  * per-ticker pct_change DailyReturn, the 20-row rolling volatility
  * with the min_periods guard, the year-granularity LEFT join to the
  * annual econ frame, the constant-predicate country join — composed
  * as ONE query whose fact rows hash-match DuckDB recomputing the
  * identical pipeline. Each piece has been declared separately since
  * earlier rounds; this row verifies the COMPOSED artifact, i.e. the
  * thing the reference exists to produce.
  *
  * The stock frame derives deterministically from `orders` (the
  * driver's tables are the only sanctioned inputs): ticker =
  * CASE(o_custkey % 4 → the reference's three index symbols + one
  * 'Other'), one row per (ticker, day), and Close/Open are BOUNDED
  * synthetic prices `100 + (price_cents % 1000)/100 ∈ [100, 110)` so
  * every daily return satisfies |ret| ≤ 0.1 — inside
  * `StarSchemaBuilder.buildFact`'s documented Σfp² < 2⁵³ exactness
  * band, making the volatility doubles bit-identical cross-engine.
  * The annual econ frame covers only years ≤ 1997 so the year LEFT
  * join genuinely NULL-pads later rows (the reference's lagging
  * world-bank feed), and contributes a Jan-1 date absent from some
  * stock calendars so DimDate's union-distinct is load-bearing.
  *
  * Scale shape (the reference's whole point, done Spark-first): ONE
  * hash exchange on ticker carries the window metrics; every
  * dimension and the econ year frame BROADCAST (PlanSpec-gated); the
  * fact is never shuffled again — the same plan `SparkEntry.entry`
  * smoke-checks, now hash-verified.
  */
object StarPipelineQueries {

  /** Derived deterministic stock frame: one row per (Ticker, Date). */
  private[queries] def stocksFrame(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val o = t(s, d, "orders")
    val ck = col("o_custkey") % 4
    val ticker = when(ck === 0, "^GSPC").when(ck === 1, "^NDX")
      .when(ck === 2, "^DJI").otherwise("T3")
    // exact integer cents (the bollinger/rsi encoding) → bounded
    // synthetic prices: min/max are exact long aggregates, the final
    // arithmetic a short IEEE chain mirrored verbatim in the oracle
    val cents = floor(col("o_totalprice").cast("double") * lit(100.0)
      + lit(0.5)).cast("long")
    o.select(ticker.as("Ticker"),
        col("o_orderdate").cast("date").as("Date"), cents.as("__c"))
      .groupBy(col("Ticker"), col("Date"))
      .agg(count(lit(1)).as("Volume"),
        min(col("__c")).as("__minc"), max(col("__c")).as("__maxc"))
      .select(col("Ticker"), col("Date"), col("Volume"),
        (lit(100.0) + (col("__minc") % 1000).cast("double") / lit(100.0))
          .as("Open"),
        (lit(100.0) + (col("__maxc") % 1000).cast("double") / lit(100.0))
          .as("Close"))
      .withColumn("High", greatest(col("Open"), col("Close")))
      .withColumn("Low", least(col("Open"), col("Close")))
  }

  /** Derived annual econ frame (years ≤ 1997 only — the LEFT join
    * must have genuinely unmatched fact years). */
  private[queries] def econFrame(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    t(s, d, "orders")
      .select(year(col("o_orderdate").cast("date")).cast("long").as("yr"))
      .distinct()
      .filter(col("yr") <= 1997)
      .select(make_date(col("yr").cast("int"), lit(1), lit(1)).as("date"),
        ((col("yr") % 5).cast("double") * lit(0.7)).as("GDPGrowthRate"),
        ((col("yr") % 3).cast("double") * lit(1.1) + lit(0.5))
          .as("InflationRate"))

  val queries: Map[String, QFn] = Map(
    // The reference dashboard's Charts-page query (streamlit/app.py:
    // 105-110 — the END-USER query the whole star exists to serve):
    // the fact sliced to ONE index and a date range, ordered by
    // DateKey, projecting the two plotted series (Close,
    // GDPGrowthRate) plus the window metrics. The app filters the
    // fact on IndexKey; IndexKey = md5(Ticker), so the engine-side
    // equivalent slices the window's PARTITION KEY before the
    // pipeline — value-identical (windows partition by Ticker; the
    // dim join keys on md5(Ticker)), and at 100 TB only the selected
    // series is ever windowed instead of the whole fact (Catalyst
    // does NOT infer the ticker constraint through the md5 join key
    // on its own — measured: the IndexKey-equality form windows every
    // ticker and drops the rest at the join). The date range stays
    // ABOVE the window, as it must (the rolling frame needs
    // preceding rows); PlanSpec gates the below/above split.
    "q_dashboard_slice" -> { (s, d) =>
      val stocks = stocksFrame(s, d).filter(col("Ticker") === "^GSPC")
      val econ = econFrame(s, d)
      val dimIndex = StarSchemaBuilder.buildDimStockIndex(stocks)
      val fact = StarSchemaBuilder.buildFact(stocks, econ, dimIndex,
        StarSchemaBuilder.buildDimCountry(s))
      fact
        .filter(col("DateKey") >= lit("1994-01-01").cast("date") &&
          col("DateKey") <= lit("1996-12-31").cast("date"))
        .select(col("DateKey"), col("Close"), col("DailyReturn"),
          col("Volatility"), col("GDPGrowthRate"))
        .orderBy(col("DateKey"))
    },

    "q_star_schema" -> { (s, d) =>
      val stocks = stocksFrame(s, d)
      val econ = econFrame(s, d)
      // the REAL builder functions — this row hash-verifies
      // StarSchemaBuilder itself, not a re-implementation
      val dimDate = StarSchemaBuilder.buildDimDate(stocks, econ)
      val dimIndex = StarSchemaBuilder.buildDimStockIndex(stocks)
      val dimCountry = StarSchemaBuilder.buildDimCountry(s)
      // rangePartitionForStarSort: the one fact exchange is RANGE on
      // IndexKey ALONE — the prefix rule then covers both the window's
      // per-key clustering AND this query's terminal (IndexKey,
      // DateKey) total order, so the fact shuffles ONCE instead of
      // window-hash + sort-range (r17; PlanSpec-gated). Do NOT range
      // on (IndexKey, DateKey): a key's dates then straddle a
      // partition boundary and the window re-inserts a hash exchange
      // (measured worse — StarSchemaBuilder.buildFact's own note)
      val fact = StarSchemaBuilder.buildFact(stocks, econ, dimIndex, dimCountry,
        rangePartitionForStarSort = true)
      fact
        // the reference's fact build joins DimDate for the date
        // surrogate (fetch_stocks.py:238); surface its derived
        // columns so the dimension's content is under the hash too
        .join(broadcast(dimDate.select(col("DateKey"),
          col("Year").cast("long").as("Year"),
          col("Month").cast("long").as("Month"), col("IsWeekend"))),
          Seq("DateKey"))
        .join(broadcast(dimIndex.select(col("IndexKey"), col("IndexName"))),
          Seq("IndexKey"))
        .select(col("DateKey"), col("IndexKey"), col("IndexName"),
          col("CountryKey"), col("Year"), col("Month"), col("IsWeekend"),
          col("Open"), col("High"), col("Low"), col("Close"), col("Volume"),
          col("DailyReturn"), col("Volatility"),
          col("GDPGrowthRate"), col("InflationRate"))
        .orderBy(col("IndexKey"), col("DateKey"))
    },
  )

  /** The shared DuckDB CTE chain of the pipeline (base → stocks →
    * econ → dims → ret → rfp → vol), used by both oracle queries so
    * the mirrored arithmetic exists exactly once. */
  private val starCtes: String =
    """base AS (
        |  SELECT CASE WHEN o_custkey % 4 = 0 THEN '^GSPC'
        |              WHEN o_custkey % 4 = 1 THEN '^NDX'
        |              WHEN o_custkey % 4 = 2 THEN '^DJI'
        |              ELSE 'T3' END AS Ticker,
        |         CAST(o_orderdate AS DATE) AS Date,
        |         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c
        |  FROM orders),
        |stocks AS (
        |  SELECT Ticker, Date, CAST(count(*) AS BIGINT) AS Volume,
        |         100.0 + CAST(min(c) % 1000 AS DOUBLE) / 100.0 AS Open,
        |         100.0 + CAST(max(c) % 1000 AS DOUBLE) / 100.0 AS Close
        |  FROM base GROUP BY 1, 2),
        |stocks2 AS (
        |  SELECT *, greatest(Open, Close) AS High, least(Open, Close) AS Low
        |  FROM stocks),
        |econ AS (
        |  SELECT make_date(CAST(yr AS INT), 1, 1) AS date,
        |         CAST(yr % 5 AS DOUBLE) * 0.7 AS GDPGrowthRate,
        |         CAST(yr % 3 AS DOUBLE) * 1.1 + 0.5 AS InflationRate
        |  FROM (SELECT DISTINCT CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS yr
        |        FROM orders)
        |  WHERE yr <= 1997),
        |dimdate AS (
        |  SELECT DateKey, CAST(year(DateKey) AS BIGINT) AS Year,
        |         CAST(month(DateKey) AS BIGINT) AS Month,
        |         dayofweek(DateKey) IN (0, 6) AS IsWeekend
        |  FROM (SELECT Date AS DateKey FROM stocks
        |        UNION
        |        SELECT date AS DateKey FROM econ)),
        |dimindex AS (
        |  SELECT DISTINCT md5(Ticker) AS IndexKey,
        |         CASE WHEN Ticker = '^GSPC' THEN 'S&P 500'
        |              WHEN Ticker = '^DJI' THEN 'Dow Jones Industrial Average'
        |              WHEN Ticker = '^NDX' THEN 'Nasdaq 100'
        |              ELSE 'Other' END AS IndexName,
        |         Ticker AS IndexCode
        |  FROM stocks),
        |ret AS (
        |  SELECT *, Close / lag(Close) OVER w - 1.0 AS DailyReturn
        |  FROM stocks2
        |  WINDOW w AS (PARTITION BY Ticker ORDER BY Date)),
        |rfp AS (
        |  SELECT *, CAST(floor(DailyReturn * 100000000.0 + 0.5) AS BIGINT) AS fp
        |  FROM ret),
        |vol AS (
        |  SELECT *, count(DailyReturn) OVER f AS n,
        |         CAST(sum(fp) OVER f AS DOUBLE) AS sx,
        |         CAST(sum(fp * fp) OVER f AS DOUBLE) AS sxx
        |  FROM rfp
        |  WINDOW f AS (PARTITION BY Ticker ORDER BY Date
        |               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))""".stripMargin

  /** The mirrored volatility expression over the `vol` CTE's columns. */
  private val volCase: String =
    """CASE WHEN v.n >= 20 THEN
      |         sqrt(greatest((v.sxx - v.sx * v.sx / 20.0) / 19.0, 0.0))
      |           / 100000000.0 END""".stripMargin

  val sql: Map[String, String] = Map(
    // The identical pipeline in DuckDB, stage for stage; every double
    // op mirrored in the same association (literals that must be
    // DOUBLE are CAST — bare DuckDB numerics are DECIMAL), the
    // volatility from the same exact fixed-point integer sums.
    "q_star_schema" ->
      s"""WITH $starCtes
        |SELECT v.Date AS DateKey, di.IndexKey, di.IndexName,
        |       'USA' AS CountryKey, dd.Year, dd.Month, dd.IsWeekend,
        |       v.Open, v.High, v.Low, v.Close, v.Volume, v.DailyReturn,
        |       $volCase AS Volatility,
        |       e.GDPGrowthRate, e.InflationRate
        |FROM vol v
        |JOIN dimindex di ON md5(v.Ticker) = di.IndexKey
        |LEFT JOIN econ e ON year(v.Date) = year(e.date)
        |JOIN dimdate dd ON v.Date = dd.DateKey
        |ORDER BY di.IndexKey, DateKey""".stripMargin,

    // The Charts-page slice: one index + date range over the same
    // pipeline (the dimindex join is unnecessary for the projected
    // columns — md5(Ticker) = md5('^GSPC') is the same predicate the
    // IndexKey equality reduces to).
    "q_dashboard_slice" ->
      s"""WITH $starCtes
        |SELECT v.Date AS DateKey, v.Close, v.DailyReturn,
        |       $volCase AS Volatility,
        |       e.GDPGrowthRate
        |FROM vol v
        |LEFT JOIN econ e ON year(v.Date) = year(e.date)
        |WHERE md5(v.Ticker) = md5('^GSPC')
        |  AND v.Date >= DATE '1994-01-01' AND v.Date <= DATE '1996-12-31'
        |ORDER BY DateKey""".stripMargin,
  )
}
