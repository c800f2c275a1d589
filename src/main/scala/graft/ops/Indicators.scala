package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Technical-indicator operators over per-key ordered price series —
  * the analytical layer the reference computes in its fact-table build
  * (daily return `fetch_stocks.py:213`, rolling volatility
  * `fetch_stocks.py:216`) extended with the two classic momentum /
  * risk indicators a stock dashboard adds next: RSI and maximum
  * drawdown.
  *
  * Determinism contract (the same §7.3 discipline as the declared
  * window queries): prices enter as exact DECIMAL, every windowed
  * reduction (gain/loss sums, running max) happens in DECIMAL — exact
  * under any partitioning / 1000-executor merge order — and each
  * indicator performs exactly ONE double division at the end (IEEE-
  * identical on any engine).
  *
  * 100 TB shape: both indicators are a single hash exchange on the
  * series key and one sort per partition (the window). No joins, no
  * second shuffle; a follow-up per-key aggregate (drawdown) reuses the
  * window's partitioning, so it adds no exchange.
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
    * tiebreakers included) or ranks are non-deterministic. */
  def rsi(df: DataFrame, key: Column, orderCols: Seq[Column],
      price: Column, period: Int = 14): DataFrame = {
    // same reserved-name discipline as TrainPrep.packBins: withColumn
    // silently OVERWRITES same-named inputs, so fail loudly instead
    val reserved = Seq("rn", "rsi", "__p", "__d", "__cg", "__cl",
      "__sg", "__sl")
    val clash = df.columns.toSet.intersect(reserved.toSet)
    require(clash.isEmpty,
      s"input already has column(s) $clash reserved by rsi()")
    val w = Window.partitionBy(key).orderBy(orderCols: _*)
    val running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // exact integer units BEFORE the window: DECIMAL → long via a pure
    // scale shift (scale 4 covers any DECIMAL(p,≤4) price; the cast is
    // exact), so the lag + diff run native-long in WindowExec instead
    // of per-row BigDecimal — identical values, (a-b)·10⁴ ≡ a·10⁴-b·10⁴
    // exactly for scale-≤4 decimals. Materialized as __p BEFORE the
    // window: writing the expression inline in `p - lag(p).over(w)`
    // CSEs the window ARGUMENT but re-evaluates the full decimal chain
    // in the post-window projection for the subtraction's left side
    // (observed in the physical plan) — a named column evaluates it
    // once per row.
    val p = (price.cast("decimal(22,4)") * lit(10000)).cast("long")
    // The trailing `period`-row sums are CUMULATIVE sums minus their
    // `period`-lag, NOT sliding frames: Spark has no aggregate
    // retraction, so a ROWS (-13, 0) frame re-aggregates the whole
    // buffer on every row — O(period) per row; the running frame and
    // the offset lookup are O(1) per row. (At period=14 / sf0.1 the
    // end-to-end win is small — the query is scan- and final-sort-
    // dominated — but the frame cost no longer grows with the
    // period.) Exact: the sums
    // are integers, so cum(rn) − cum(rn−period) is the frame sum with
    // no cancellation error — the reformulation would be UNSAFE for
    // floats. Three same-spec Window nodes share one sort/exchange;
    // same-spec expressions are emitted per select() so each node
    // carries all its functions in one pass (a withColumn chain would
    // split them into one pass each).
    df.withColumn("__p", p)
      .select(col("*"),
        row_number().over(w).cast("long").as("rn"),
        (col("__p") - lag(col("__p"), 1).over(w)).as("__d"))
      .select(col("*"),
        sum(greatest(col("__d"), lit(0L))).over(running).as("__cg"),
        sum(greatest(-col("__d"), lit(0L))).over(running).as("__cl"))
      .select(col("*"),
        (col("__cg") - coalesce(lag(col("__cg"), period).over(w), lit(0L)))
          .as("__sg"),
        (col("__cl") - coalesce(lag(col("__cl"), period).over(w), lit(0L)))
          .as("__sl"))
      .withColumn("rsi",
        when(col("rn") >= period + 1 && (col("__sg") + col("__sl")) > 0,
          round(lit(100.0) * col("__sg").cast("double") /
            (col("__sg") + col("__sl")).cast("double"), 4)))
      .drop("__p", "__d", "__cg", "__cl", "__sg", "__sl")
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
    * series). The groupBy reuses the window's hash partitioning on
    * `key`, so the whole operator is ONE exchange. */
  def maxDrawdown(df: DataFrame, key: Column, orderCols: Seq[Column],
      price: Column): DataFrame = {
    require(!df.columns.contains("__dd"),
      "input already has column __dd reserved by maxDrawdown()")
    val w = Window.partitionBy(key).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    // scale 4 covers any DECIMAL(p,≤4) price; the cast chain is exact
    val p = (price.cast("decimal(22,4)") * lit(10000)).cast("long")
    val dd = p.cast("double") / max(p).over(w).cast("double") - lit(1.0)
    df.withColumn("__dd", dd)
      .groupBy(key.as("key"))
      .agg(count(lit(1)).as("n_obs"),
        round(min(col("__dd")), 4).as("max_drawdown"))
  }
}
