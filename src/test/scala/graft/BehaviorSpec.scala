package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** graft.ops.Behavior — funnel ORDER semantics (an out-of-order
  * conversion must not count) and cohort week bucketing. */
class BehaviorSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val events = Seq(
    // u1 converts fully in order
    (1L, "view", ts("2024-01-01 10:00:00")),
    (1L, "click", ts("2024-01-01 10:05:00")),
    (1L, "purchase", ts("2024-01-01 10:10:00")),
    // u2 purchases BEFORE clicking — must not count as a purchase
    (2L, "view", ts("2024-01-01 09:00:00")),
    (2L, "purchase", ts("2024-01-01 09:30:00")),
    (2L, "click", ts("2024-01-01 10:00:00")),
    // u3 clicks without ever viewing — enters no stage
    (3L, "click", ts("2024-01-01 11:00:00")),
    // u4 views only
    (4L, "view", ts("2024-01-02 08:00:00")),
    // u1 again 8 and 15 days later (weeks 1 and 2 of its cohort)
    (1L, "view", ts("2024-01-09 10:00:00")),
    (1L, "view", ts("2024-01-16 10:00:00"))
  ).toDF("user_id", "event_type", "t")

  test("funnel: stage order is enforced; equal-timestamp events count") {
    val out = ops.Behavior.funnelCounts(events,
      col("user_id"), col("event_type"), col("t"),
      Seq("view", "click", "purchase")).head()
    // views: u1, u2, u4. clicks after view: u1, u2. purchases after
    // that click: u1 only (u2's purchase predates its click).
    assert((out.getLong(0), out.getLong(1), out.getLong(2)) == ((3L, 2L, 1L)))
  }

  test("funnel: stage times are the FIRST qualifying events") {
    val times = ops.Behavior.funnelTimes(events,
      col("user_id"), col("event_type"), col("t"),
      Seq("view", "click")).last.orderBy("user_id").collect()
    assert(times.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(times.map(_.getTimestamp(1)).toSeq ==
      Seq(ts("2024-01-01 10:05:00"), ts("2024-01-01 10:00:00")))
  }

  test("cohort retention: week buckets are integer day//7 from first-seen day") {
    val out = ops.Behavior.cohortRetention(events, col("user_id"), col("t"))
      .orderBy(col("cohort_day"), col("week")).collect()
      // cohort_day is TIMESTAMP_NTZ → LocalDateTime in the Row
      .map(r => (r.getAs[java.time.LocalDateTime](0).toLocalDate.toString,
        r.getLong(1), r.getLong(2)))
      .toSeq
    // 2024-01-01 cohort: u1,u2,u3 active week 0; u1 again weeks 1, 2.
    // 2024-01-02 cohort: u4 week 0.
    assert(out == Seq(
      ("2024-01-01", 0L, 3L), ("2024-01-01", 1L, 1L), ("2024-01-01", 2L, 1L),
      ("2024-01-02", 0L, 1L)))
  }

  test("Quantiles.exactByGroup matches the WITHIN GROUP / percentile SQL surface bit-for-bit") {
    // r15: the declared percentile queries moved from Spark's
    // interpreted percentile/percentile_disc aggregates to the
    // codegen rank-window form. This pins the equivalence on the SQL
    // surface itself — including p = 0.4, the binary-rounding hazard
    // case where a ceil(p*n) index formulation diverges from the
    // cume_dist >= p comparison both engines actually make.
    val o = queries.t(spark, sfTiny, "orders")
    o.createOrReplaceTempView("bq_orders_v")
    val sqlRes = spark.sql(
      """SELECT o_orderpriority,
        |  percentile_disc(0.25) WITHIN GROUP (ORDER BY o_totalprice) AS p25,
        |  percentile_disc(0.4)  WITHIN GROUP (ORDER BY o_totalprice) AS p40,
        |  percentile_disc(0.75) WITHIN GROUP (ORDER BY o_totalprice) AS p75,
        |  percentile(o_totalprice, 0.5) AS m50,
        |  percentile(o_totalprice, 0.25) AS m25
        |FROM bq_orders_v GROUP BY o_orderpriority""".stripMargin)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    val win = graft.ops.Quantiles.exactByGroup(o,
        col("o_orderpriority"), col("o_totalprice"),
        disc = Seq(("p25", 0.25), ("p40", 0.4), ("p75", 0.75)),
        cont = Seq(("m50", 0.5), ("m25", 0.25)))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(win == sqlRes)
  }
}
