package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** graft.ops.AsOfJoin — hand-checkable semantics: inclusive backward
  * match, per-key isolation, null when nothing precedes, tolerance
  * cutoff, and the forward mirror. */
class AsOfJoinSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val trades = Seq(
    (1L, "A", ts("2024-01-01 10:00:00")),
    (2L, "A", ts("2024-01-01 10:05:00")),
    (3L, "A", ts("2024-01-01 10:10:00")),
    (4L, "B", ts("2024-01-01 10:02:00")),
    (5L, "B", ts("2024-01-01 09:00:00"))
  ).toDF("trade_id", "sym", "t")

  private val quotes = Seq(
    ("A", ts("2024-01-01 09:59:00"), 100.0),
    ("A", ts("2024-01-01 10:05:00"), 101.0), // equal-ts match for trade 2
    ("A", ts("2024-01-01 10:09:00"), 102.0),
    ("B", ts("2024-01-01 10:00:00"), 200.0)
  ).toDF("sym", "qt", "px")

  test("backward: inclusive latest-at-or-before per key, null when none") {
    val out = ops.AsOfJoin.backward(trades, quotes,
        keys = Seq("sym"), leftTs = "t", rightTs = "qt", payload = Seq("qt", "px"))
      .orderBy("trade_id").collect()
    assert(out.map(r => Option(r.getAs[Any]("asof_px"))).toSeq ==
      Seq(Some(100.0), Some(101.0), Some(102.0), Some(200.0), None))
  }

  test("backward with tolerance nulls out stale matches") {
    val out = ops.AsOfJoin.backward(trades, quotes,
        keys = Seq("sym"), leftTs = "t", rightTs = "qt", payload = Seq("qt", "px"),
        toleranceMicros = Some(60L * 1000000))  // 1 minute
      .orderBy("trade_id").collect()
    // trade1: 10:00 vs quote 09:59 (60s) -> kept; trade2: equal ts kept;
    // trade3: 10:10 vs 10:09 (60s) kept; trade4: 10:02 vs 10:00 (120s) -> null
    assert(out.map(r => Option(r.getAs[Any]("asof_px"))).toSeq ==
      Seq(Some(100.0), Some(101.0), Some(102.0), None, None))
  }

  test("forward: earliest at-or-after per key") {
    val out = ops.AsOfJoin.forward(trades, quotes,
        keys = Seq("sym"), leftTs = "t", rightTs = "qt", payload = Seq("qt", "px"))
      .orderBy("trade_id").collect()
    // trade1 10:00 -> A@10:05; trade2 10:05 -> A@10:05 (inclusive);
    // trade3 10:10 -> none after; trade4 10:02 -> none; trade5 09:00 -> B@10:00
    assert(out.map(r => Option(r.getAs[Any]("asof_px"))).toSeq ==
      Seq(Some(101.0), Some(101.0), None, None, Some(200.0)))
  }

  test("tie-break at equal right timestamps keeps the highest tieBreak") {
    val dupQuotes = Seq(
      ("A", ts("2024-01-01 10:00:00"), 1L, 50.0),
      ("A", ts("2024-01-01 10:00:00"), 2L, 60.0)
    ).toDF("sym", "qt", "qid", "px")
    val l = Seq((1L, "A", ts("2024-01-01 10:01:00"))).toDF("trade_id", "sym", "t")
    val out = ops.AsOfJoin.backward(l, dupQuotes,
        keys = Seq("sym"), leftTs = "t", rightTs = "qt",
        payload = Seq("qt", "qid", "px"), tieBreak = Some("qid"))
      .collect()
    assert(out.head.getAs[Double]("asof_px") == 60.0)
  }

  test("forward tie-break also keeps the highest tieBreak") {
    val dupQuotes = Seq(
      ("A", ts("2024-01-01 10:00:00"), 1L, 50.0),
      ("A", ts("2024-01-01 10:00:00"), 2L, 60.0)
    ).toDF("sym", "qt", "qid", "px")
    val l = Seq((1L, "A", ts("2024-01-01 09:59:00"))).toDF("trade_id", "sym", "t")
    val out = ops.AsOfJoin.forward(l, dupQuotes,
        keys = Seq("sym"), leftTs = "t", rightTs = "qt",
        payload = Seq("qt", "qid", "px"), tieBreak = Some("qid"))
      .collect()
    assert(out.head.getAs[Double]("asof_px") == 60.0)
  }

  test("declared q_asof_join matches a window-free reference on sf0.001") {
    val got = SparkEntry.queries("q_asof_join")(spark, sfTiny)
    // Reference: per event, max purchase ts <= event ts via a raw join
    // + groupBy (quadratic — fine at sf0.001).
    val e = queries.t(spark, sfTiny, "events").select(col("event_id"), col("user_id"), col("ts"))
    val p = queries.t(spark, sfTiny, "events")
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id").as("pu"), col("ts").as("pts"))
      .agg(max(col("event_id")).as("pid"))
    val best = e.join(p, col("user_id") === col("pu") && col("pts") <= col("ts"), "left")
      .groupBy(col("event_id")).agg(max(struct(col("pts"), col("pid"))).as("m"))
      .select(col("event_id"), col("m.pid").as("ref_pid"))
    val diff = got.join(best, Seq("event_id"))
      .filter(not(col("last_purchase_id") <=> col("ref_pid")))
      .count()
    assert(diff == 0)
    assert(got.count() == e.count())
  }
}
