package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Technical-indicator operators over per-key ordered price series —
  * the analytical layer the reference computes in its fact-table build
  * (daily return `fetch_stocks.py:213`, rolling volatility
  * `fetch_stocks.py:216`) extended with the classic momentum / risk
  * indicators a stock dashboard adds next: RSI, Bollinger bands and
  * maximum drawdown.
  *
  * Determinism contract (the same §7.3 discipline as the declared
  * window queries): prices enter as exact DECIMAL, every windowed
  * reduction (gain/loss sums, running max) happens in DECIMAL — exact
  * under any partitioning / 1000-executor merge order — and each
  * indicator performs exactly ONE double division at the end (IEEE-
  * identical on any engine).
  *
  * 100 TB shape: every indicator is a SINGLE exchange on the series
  * key and one sort per partition (the window). No joins, no second
  * shuffle; a follow-up per-key aggregate (drawdown) reuses the
  * window's partitioning, and the range-partitioned forms let a
  * (key, series-order) consumer sort-elide entirely.
  */
object Indicators {

  /** Cutler's RSI (simple-moving-average form — the deterministic
    * variant; Wilder's EMA smoothing is order-dependent recursive
    * state): `100 * SMA(gain, n) / (SMA(gain, n) + SMA(loss, n))`
    * over the `period`-diff trailing window.
    *
    * Returns the input plus `rn` (position in its series) and `rsi`
    * (non-null from row `period`+1 on, when a full window of diffs
    * exists; null when the window's total movement is zero).
    *
    * `price` must be DECIMAL (cast upstream — exact diffs); internally
    * the gain/loss sums run over INTEGER sub-cent units (the decimal
    * diff scaled by its own scale factor — exact by construction):
    * native-long window aggregation instead of per-row BigDecimal
    * objects, ~5× faster in WindowExec, and the scale factor cancels
    * in the ratio, so the result is the same real number — and the
    * same DOUBLE, provided the oracle also divides the exact integer
    * pair (both sums < 2^53 ⇒ their doubles are exact).
    *
    * `orderCols` must form a total order within a key (unique
    * tiebreakers included) or ranks are non-deterministic.
    *
    * `completeOnly = true` keeps only the rows where the indicator is
    * defined (a full `period`-diff window exists and the window moved)
    * and makes `rsi` non-nullable. Beyond convenience it is the fast
    * path: the generic nullable form makes a downstream
    * `rsi.isNotNull` filter inline the WHOLE CASE — including the
    * BigDecimal-allocating round() — and evaluate it once per INPUT
    * row in the pushed-down Filter and again in the output projection
    * (observed in the physical plan, ~2× the rounding cost). With
    * `completeOnly` the filter is two native-long comparisons and
    * round() runs exactly once, over survivors only.
    *
    * `rangeExchange = true` RANGE-partitions the one series exchange
    * (the [[bollinger]] r15 discipline, ported r18): a caller ordering
    * the output by (key, window order) then needs NO second exchange
    * and NO terminal sort — the r9 "fused" experiment that measured
    * WORSE (0.88 s) predated that sort elision and still planned a
    * second range exchange for the terminal sort; with the elision the
    * isolated min-of-9 reads 0.70 vs 1.09 s at sf0.1 and the shuffle
    * drops 21.4 → 15.2 MB (the second exchange's bytes). Default
    * `false` because a pre-partitioned input should NOT re-shuffle:
    * over a series-key-bucketed table the default plans with ZERO
    * exchanges (IndicatorsSpec), which the forced repartition would
    * destroy. */
  def rsi(df: DataFrame, key: Column, orderCols: Seq[Column],
      price: Column, period: Int = 14,
      completeOnly: Boolean = false,
      rangeExchange: Boolean = false): DataFrame = {
    // same reserved-name discipline as TrainPrep.packBins: withColumn
    // silently OVERWRITES same-named inputs, so fail loudly instead
    val reserved = Seq("rn", "rsi", "__p", "__d", "__cg", "__cl",
      "__sg", "__sl")
    val clash = df.columns.toSet.intersect(reserved.toSet)
    require(clash.isEmpty,
      s"input already has column(s) $clash reserved by rsi()")
    val w = Window.partitionBy(key).orderBy(orderCols: _*)
    // Exact integer sub-units BEFORE the window, via pure DOUBLE
    // arithmetic: floor(double(price)·10⁴ + 0.5). For any price of
    // decimal scale ≤ 4 with |price|·10⁴ < 2⁵¹ (i.e. any realistic
    // money column) this recovers price·10⁴ EXACTLY — double(price) is
    // the correctly-rounded double (relative error 2⁻⁵³), so after
    // ×10⁴ the absolute error is ≪ 0.5 and floor(x+0.5) lands on the
    // true integer for either sign. The arithmetically-equivalent
    // decimal chain `cast(decimal(22,4)) * 10000 → long` costs ~0.3 s
    // per 600 k rows (precision 22 > 18 forces BigDecimal-backed
    // Decimals, one allocation per row); the double path is three
    // codegen'd native ops. Materialized as __p BEFORE the window:
    // writing the expression inline in `p - lag(p).over(w)` CSEs the
    // window ARGUMENT but re-evaluates the chain in the post-window
    // projection for the subtraction's left side (observed in the
    // physical plan) — a named column evaluates it once per row.
    val p = floor(price.cast("double") * lit(10000.0) + lit(0.5)).cast("long")
    // see the scaladoc: the [[bollinger]] one-exchange discipline,
    // opt-in so bucketed inputs keep their zero-exchange plan; the
    // count is pinned to the session's shuffle parallelism for the
    // same AQE-coalescing reason bollinger documents
    val base =
      if (rangeExchange)
        df.repartitionByRange(
          df.sparkSession.sessionState.conf.numShufflePartitions, key)
      else df
    // The trailing `period`-row gain/loss sums: period-adaptive frame
    // strategy. Spark has no aggregate retraction, so a sliding ROWS
    // (-(period-1), 0) frame re-aggregates its buffer on every row —
    // O(period)/row — while the cumulative-minus-period-lag form is
    // O(1)/row but costs a THIRD window pass (the lag of a window
    // result needs its own node). Measured at sf0.1: each extra
    // WindowExec pass costs more than 2×period long-adds, so small
    // periods (≤ 32: ≤ 64 adds/row) take the 2-pass sliding form and
    // large periods the 3-pass O(1) form — the frame cost never grows
    // past ~64 adds/row either way. Exact under both: the sums are
    // integers (cum(rn) − cum(rn−period) has no cancellation error —
    // the reformulation would be UNSAFE for floats). Same-spec Window
    // nodes share ONE sort/exchange; same-spec expressions are emitted
    // per select() so each node carries all its functions in one pass
    // (a withColumn chain would split them into one pass each).
    val p1 = base.withColumn("__p", p)
      .select(col("*"),
        row_number().over(w).cast("long").as("rn"),
        (col("__p") - lag(col("__p"), 1).over(w)).as("__d"))
    val withSums =
      if (period <= 32) {
        val sliding = w.rowsBetween(-(period - 1), 0)
        p1.select(col("*"),
          sum(greatest(col("__d"), lit(0L))).over(sliding).as("__sg"),
          sum(greatest(-col("__d"), lit(0L))).over(sliding).as("__sl"))
      } else {
        val running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        p1.select(col("*"),
            sum(greatest(col("__d"), lit(0L))).over(running).as("__cg"),
            sum(greatest(-col("__d"), lit(0L))).over(running).as("__cl"))
          .select(col("*"),
            (col("__cg") - coalesce(lag(col("__cg"), period).over(w), lit(0L)))
              .as("__sg"),
            (col("__cl") - coalesce(lag(col("__cl"), period).over(w), lit(0L)))
              .as("__sl"))
      }
    val defined = col("rn") >= period + 1 && (col("__sg") + col("__sl")) > 0
    val ratio = round(lit(100.0) * col("__sg").cast("double") /
      (col("__sg") + col("__sl")).cast("double"), 4)
    val out =
      if (completeOnly) withSums.filter(defined).withColumn("rsi", ratio)
      else withSums.withColumn("rsi", when(defined, ratio))
    out.drop("__p", "__d", "__cg", "__cl", "__sg", "__sl")
  }

  /** Bollinger bands (mid = `period`-row SMA of price, upper/lower =
    * mid ± `k`·sample-stddev over the same trailing frame) with the
    * pandas min_periods guard: rows before a full window exist are
    * dropped (the q_rsi `completeOnly` convention — a nullable CASE
    * would inline the whole band arithmetic into a pushed-down filter,
    * see [[rsi]]'s scaladoc).
    *
    * Exactness: prices enter as exact integer CENTS
    * (`floor(double(price)·10² + 0.5)` — exact for any scale-≤2 money
    * column), and both frame sums stay native-long: Σp ≤ period·p and
    * Σp² ≤ period·p² must stay below 2⁵³ for the final doubles to be
    * exact, which bounds |price| < √(2⁵³/period)/100 (≈ $212,000 at
    * period 20 — an equity price, not a notional; for larger values
    * route the squares through DECIMAL). After the exact sums, the
    * band arithmetic is a fixed chain of IEEE double ops (one
    * correctly-rounded sqrt), identical on any engine — mirrored
    * operation-for-operation by the declared oracle.
    *
    * 100 TB shape: ONE exchange on the series key — RANGE-partitioned
    * (r15), so a consumer reading the bands in (key, series-order)
    * order adds no second exchange and no sort — one sort, a single
    * WindowExec pass carrying rn and both sums (same frame spec ⇒ one
    * buffer). [[rsi]] offers the same form via `rangeExchange` (r18 —
    * the r9 hash-exchange disposition predated this sort elision). */
  def bollinger(df: DataFrame, key: Column, orderCols: Seq[Column],
      price: Column, period: Int = 20, k: Double = 2.0): DataFrame = {
    val reserved = Seq("rn", "mid", "upper", "lower", "__p", "__sx", "__sxx")
    val clash = df.columns.toSet.intersect(reserved.toSet)
    require(clash.isEmpty,
      s"input already has column(s) $clash reserved by bollinger()")
    require(period >= 2, s"period=$period needs at least 2 rows for stddev")
    val w = Window.partitionBy(key).orderBy(orderCols: _*)
    val frame = w.rowsBetween(-(period - 1), 0)
    // exact integer cents via the double path (see scaladoc); a named
    // column, not inline — the [[rsi]] CSE discipline
    val p = floor(price.cast("double") * lit(100.0) + lit(0.5)).cast("long")
    // RANGE-partition the series exchange (vs the window's default
    // hash): RangePartitioning(key) satisfies the window's clustering,
    // and a caller ordering its output by (key, window order) — the
    // natural way to read a band series — then needs NO second
    // exchange and NO second sort: the sampling pass of that terminal
    // sort re-executed the whole window chain (measured ~0.2 s of
    // q_bollinger's 0.66 s at sf0.1). Skew profile unchanged: one
    // series is one partition under either partitioning. The count is
    // pinned to the session's shuffle parallelism — the column-only
    // form lets AQE coalesce the (small) shuffle to a handful of
    // partitions and strangle the WINDOW's parallelism downstream.
    val withSums = df.repartitionByRange(
        df.sparkSession.sessionState.conf.numShufflePartitions, key)
      .withColumn("__p", p)
      .select(col("*"),
        row_number().over(w).cast("long").as("rn"),
        sum(col("__p")).over(frame).as("__sx"),
        sum(col("__p") * col("__p")).over(frame).as("__sxx"))
      // min_periods: only rows with a FULL frame — n in the band
      // arithmetic is then the constant `period`, which the oracle
      // mirrors as a literal
      .filter(col("rn") >= period)
    val sx = col("__sx").cast("double")
    val sxx = col("__sxx").cast("double")
    val meanP = sx / lit(period.toDouble)
    val stdP = sqrt(greatest(
      (sxx - sx * sx / lit(period.toDouble)) / lit((period - 1).toDouble),
      lit(0.0)))
    withSums
      .withColumn("mid", meanP / lit(100.0))
      .withColumn("upper", (meanP + lit(k) * stdP) / lit(100.0))
      .withColumn("lower", (meanP - lit(k) * stdP) / lit(100.0))
      .drop("__p", "__sx", "__sxx")
  }

  /** Maximum drawdown per series key: the most negative
    * peak-to-trough fraction `price / running_max(price) - 1`.
    *
    * The running max runs over exact INTEGER sub-unit prices (the
    * DECIMAL price scaled by 1e4 — same trick as [[rsi]]): native-long
    * aggregation in WindowExec instead of a per-row BigDecimal compare
    * (~2× faster at sf0.1), and the scale factor cancels in the ratio.
    * Determinism is *improved*: both scaled values are integers < 2^53,
    * so their doubles are exact and the one division is the correctly-
    * rounded real ratio on any engine — no double-of-decimal rounding
    * entering the quotient. Output: (key, n_obs, max_drawdown), one
    * row per key, drawdown rounded to 4 dp (0.0 for a monotone-rising
    * series). The groupBy reuses the window's partitioning on `key` —
    * RANGE-partitioned since r15, so a terminal ORDER BY key is a
    * partition-local sort — and the whole operator is ONE exchange. */
  def maxDrawdown(df: DataFrame, key: Column, orderCols: Seq[Column],
      price: Column): DataFrame = {
    require(!df.columns.contains("__dd"),
      "input already has column __dd reserved by maxDrawdown()")
    val w = Window.partitionBy(key).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    // same exact double-path sub-unit encoding as [[rsi]] (scale ≤ 4,
    // |price|·10⁴ < 2⁵¹): three codegen'd native ops instead of a
    // BigDecimal-backed decimal chain — identical integers
    val p = floor(price.cast("double") * lit(10000.0) + lit(0.5)).cast("long")
    val dd = p.cast("double") / max(p).over(w).cast("double") - lit(1.0)
    // RANGE-partition the one exchange (see [[bollinger]], including
    // the pinned partition count): the grouped aggregate still reuses
    // it (RangePartitioning satisfies ClusteredDistribution), and a
    // caller's terminal ORDER BY key collapses to a partition-local
    // sort with no second exchange — whose sampling pass had
    // re-executed window + aggregate.
    df.repartitionByRange(
        df.sparkSession.sessionState.conf.numShufflePartitions, key)
      .withColumn("__dd", dd)
      .groupBy(key.as("key"))
      .agg(count(lit(1)).as("n_obs"),
        round(min(col("__dd")), 4).as("max_drawdown"))
  }
}
