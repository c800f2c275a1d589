package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** graft.ops.Indicators — RSI and max drawdown on hand-computed
  * series, plus the null/guard semantics and key isolation. */
class IndicatorsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // One key, strictly interleaved gains/losses of known size. Using
  // period = 2 keeps the arithmetic hand-checkable: with prices
  // 10, 11, 13, 12, 16 the diffs are +1, +2, -1, +4.
  private val px = Seq(
    ("A", 1, 10.00), ("A", 2, 11.00), ("A", 3, 13.00),
    ("A", 4, 12.00), ("A", 5, 16.00),
    // second key: monotone rising — never draws down, RSI = 100
    ("B", 1, 1.00), ("B", 2, 2.00), ("B", 3, 3.00)
  ).toDF("k", "i", "p")

  private def runRsi(period: Int) =
    ops.Indicators.rsi(px, col("k"), Seq(col("i")),
        col("p").cast("decimal(18,2)"), period)
      .select(col("k"), col("i"), col("rsi"))
      .orderBy(col("k"), col("i")).collect()
      .map(r => (r.getString(0), r.getInt(1), Option(r.getAs[Any]("rsi"))))
      .toSeq

  test("rsi: hand-computed values, null until a full diff window") {
    val out = runRsi(2)
    // A: rn 1,2 null (needs period+1 = 3 rows); rn 3: gains (1,2) no
    // losses → 100; rn 4: window diffs (+2,-1) → 100*2/3 = 66.6667;
    // rn 5: (-1,+4) → 100*4/5 = 80.
    assert(out.filter(_._1 == "A").map(_._3) ==
      Seq(None, None, Some(100.0), Some(66.6667), Some(80.0)))
    // B monotone rising: all-gain windows → 100 from rn 3 on.
    assert(out.filter(_._1 == "B").map(_._3) == Seq(None, None, Some(100.0)))
  }

  test("rsi: zero-movement window is null, not a division error") {
    val flat = Seq(("F", 1, 5.0), ("F", 2, 5.0), ("F", 3, 5.0))
      .toDF("k", "i", "p")
    val out = ops.Indicators.rsi(flat, col("k"), Seq(col("i")),
        col("p").cast("decimal(18,2)"), 2)
      .select(col("rsi")).collect()
    assert(out.forall(_.isNullAt(0)))
  }

  test("max drawdown: hand-computed trough, zero for monotone series") {
    val out = ops.Indicators.maxDrawdown(px, col("k"), Seq(col("i")),
        col("p").cast("decimal(18,2)"))
      .orderBy(col("key")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    // A: running max peaks at 13; trough 12/13 - 1 = -0.0769 (4 dp)
    assert(out == Seq(("A", 5L, -0.0769), ("B", 3L, 0.0)))
  }

  test("bollinger: hand-computed bands, min_periods drops short-frame rows") {
    // period=3, k=2 over A's 5 prices: first band row at rn 3.
    // rn 3 frame (10,11,13): mean 34/3, var = ((30²+33²+39²)·10⁴ −
    // (102·10²)²/3)/2 computed in cents — check against direct math.
    val out = ops.Indicators.bollinger(px, col("k"), Seq(col("i")),
        col("p"), period = 3, k = 2.0)
      .select(col("k"), col("i"), col("rn"), col("mid"), col("upper"), col("lower"))
      .orderBy(col("k"), col("i")).collect()
    val a = out.filter(_.getString(0) == "A")
    assert(a.map(_.getLong(2)).toSeq == Seq(3L, 4L, 5L)) // rn 1,2 dropped
    def bands(ps: Seq[Double]): (Double, Double, Double) = {
      val cents = ps.map(p => math.floor(p * 100.0 + 0.5))
      val sx = cents.sum; val sxx = cents.map(c => c * c).sum
      val mean = sx / 3.0
      val std = math.sqrt(math.max((sxx - sx * sx / 3.0) / 2.0, 0.0))
      (mean / 100.0, (mean + 2.0 * std) / 100.0, (mean - 2.0 * std) / 100.0)
    }
    val (m3, u3, l3) = bands(Seq(10.0, 11.0, 13.0))
    assert(a(0).getDouble(3) == m3 && a(0).getDouble(4) == u3 &&
      a(0).getDouble(5) == l3)
    val (m5, u5, l5) = bands(Seq(13.0, 12.0, 16.0))
    assert(a(2).getDouble(3) == m5 && a(2).getDouble(4) == u5 &&
      a(2).getDouble(5) == l5)
    // B has exactly 3 rows → exactly one band row; flat frames would
    // clamp at 0 variance (upper = lower = mid) — B rises so upper>lower
    val b = out.filter(_.getString(0) == "B")
    assert(b.length == 1 && b(0).getDouble(4) > b(0).getDouble(5))
  }

  test("bollinger: constant series clamps variance at zero (upper = mid = lower)") {
    val flat = Seq(("F", 1, 5.0), ("F", 2, 5.0), ("F", 3, 5.0))
      .toDF("k", "i", "p")
    val out = ops.Indicators.bollinger(flat, col("k"), Seq(col("i")),
        col("p"), period = 3).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getAs[Double]("mid") == 5.0 &&
      r.getAs[Double]("upper") == 5.0 && r.getAs[Double]("lower") == 5.0)
  }

  test("rsi over a series-key-bucketed table plans with zero exchanges") {
    // q_rsi's residual above floor IS its one width-independent
    // series exchange (SCALE.md bisection; RANGE since r18) — this gate proves the
    // library already owns the lever that deletes it at 100 TB: bucket
    // the fact on the series key once (Layout.writeBucketed) and every
    // recurring per-key window pass plans with NO exchange at all —
    // the bucketed scan's HashPartitioning satisfies the window's
    // required distribution, leaving only the local per-bucket sort.
    spark.sql("DROP TABLE IF EXISTS graft_b_li")
    val loc = new java.io.File("spark-warehouse/graft_b_li")
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      rm(loc)
    }
    val li = queries.t(spark, sfTiny, "lineitem")
      .select(col("l_partkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"))
    etl.Layout.writeBucketed(li, "graft_b_li", "l_partkey", 8)
    val out = ops.Indicators.rsi(spark.table("graft_b_li"),
      col("l_partkey"), Seq(col("l_orderkey"), col("l_linenumber")),
      col("l_extendedprice"))
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("Window"), p)
    assert(!p.contains("Exchange"), s"bucketed rsi must not shuffle:\n$p")
    // and the values equal the plain-parquet path exactly
    val plain = ops.Indicators.rsi(li, col("l_partkey"),
      Seq(col("l_orderkey"), col("l_linenumber")), col("l_extendedprice"))
      .select(col("l_partkey"), col("l_orderkey"), col("l_linenumber"), col("rsi"))
    val bucketed = out
      .select(col("l_partkey"), col("l_orderkey"), col("l_linenumber"), col("rsi"))
    assert(bucketed.exceptAll(plain).isEmpty && plain.exceptAll(bucketed).isEmpty)
  }

  test("rsi rangeExchange: one range exchange, values identical to the default form") {
    // The r18 opt-in one-exchange discipline (the bollinger r15 form
    // ported): the series exchange is RANGE-partitioned so a caller's
    // (key, window-order) terminal sort elides. The flag must change
    // the PLAN only — every value equals the default hash form's.
    val ranged = ops.Indicators.rsi(px, col("k"), Seq(col("i")),
      col("p").cast("decimal(18,2)"), 2, completeOnly = true,
      rangeExchange = true)
    val p = ranged.queryExecution.executedPlan.toString
    assert(p.contains("rangepartitioning"),
      s"expected a range-partitioned series exchange:\n$p")
    // scope the negative match to Exchange lines (r18 ADVICE): a
    // whole-plan contains() would flap on any future operator that
    // merely MENTIONS hashpartitioning outside an Exchange node
    val hashExchanges = p.linesIterator
      .filter(l => l.contains("Exchange") && l.contains("hashpartitioning"))
      .toSeq
    assert(hashExchanges.isEmpty,
      s"expected no hash exchange under the flag, got:\n" +
        s"${hashExchanges.mkString("\n")}\nfull plan:\n$p")
    val plain = ops.Indicators.rsi(px, col("k"), Seq(col("i")),
      col("p").cast("decimal(18,2)"), 2, completeOnly = true)
    assert(ranged.exceptAll(plain).isEmpty && plain.exceptAll(ranged).isEmpty)
  }

  test("series are isolated per key (no cross-key leakage in windows)") {
    // B's first row must not see A's prices: its rn restarts, so with
    // period=2 B's first two rows are null even though A has 5 rows.
    val out = runRsi(2)
    assert(out.filter(_._1 == "B").take(2).forall(_._3.isEmpty))
  }
}
