package graft.queries

import org.apache.spark.sql.functions._

/** Declared behavioral-analytics queries over the events stream
  * (SURVEY §2.11 extension): conversion funnel, per-type outlier
  * gate, and cohort retention — the product-analytics jobs that run
  * next to sessionization (`q_sessionize`) on the same event log.
  *
  * Determinism: stage boundaries are min-timestamp comparisons
  * (exact micros), retention buckets are integer day arithmetic, and
  * the only float output (the p95 cut) is a quantile interpolation
  * already proven engine-identical by q_quantiles_multi, rounded to
  * 4 dp with exact-integer tiebreak-free group keys.
  *
  * 100 TB shape: every query aggregates per user or per type FIRST
  * (map-side combinable; the exchange carries |users| or |types|
  * rows, never raw events), then joins user-level frames — at scale
  * those joins co-partition on user_id; the tiny per-type frames
  * broadcast.
  */
object BehaviorQueries {

  val queries: Map[String, QFn] = Map(
    // Ordered conversion funnel view → click → purchase: a user
    // converts a stage only with an event at-or-after their previous
    // stage's first timestamp. One row: users entering each stage.
    "q_funnel" -> { (s, d) =>
      graft.ops.Behavior.funnelCounts(ExtendedQueries.eventProfile(s, d),
        col("user_id"), col("event_type"), col("ts"),
        Seq("view", "click", "purchase"))
    },

    // Per-type p95 outlier gate: the exact interpolated 95th
    // percentile of value per event type, and how many events exceed
    // it — the telemetry-cleaning pass before training on metrics.
    "q_outlier_p95" -> { (s, d) =>
      val e = ExtendedQueries.eventProfile(s, d)
      val cut = e.groupBy(col("event_type"))
        .agg(percentile(col("value"), lit(0.95)).as("p95"))
      e.join(broadcast(cut), "event_type")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          round(max(col("p95")), 4).as("p95"),
          sum(when(col("value") > col("p95"), 1).otherwise(0))
            .cast("long").as("n_above"))
        .orderBy(col("event_type"))
    },

    // Weekly cohort retention: users bucketed by first-seen day;
    // distinct active users per (cohort day, week index). All
    // integer day arithmetic.
    "q_cohort_retention" -> { (s, d) =>
      graft.ops.Behavior.cohortRetention(ExtendedQueries.eventProfile(s, d),
          col("user_id"), col("ts"))
        .orderBy(col("cohort_day"), col("week"))
    },
  )

  val sql: Map[String, String] = Map(
    "q_funnel" ->
      """WITH v AS (
        |  SELECT user_id, min(ts) AS t_view FROM events
        |  WHERE event_type = 'view' GROUP BY 1
        |), c AS (
        |  SELECT e.user_id, min(e.ts) AS t_click
        |  FROM events e JOIN v USING (user_id)
        |  WHERE e.event_type = 'click' AND e.ts >= v.t_view
        |  GROUP BY 1
        |), p AS (
        |  SELECT e.user_id, min(e.ts) AS t_buy
        |  FROM events e JOIN c USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts >= c.t_click
        |  GROUP BY 1
        |)
        |SELECT (SELECT count(*) FROM v) AS n_view,
        |       (SELECT count(*) FROM c) AS n_click,
        |       (SELECT count(*) FROM p) AS n_purchase""".stripMargin,

    "q_outlier_p95" ->
      """WITH cut AS (
        |  SELECT event_type, quantile_cont(value, 0.95) AS p95
        |  FROM events GROUP BY 1
        |)
        |SELECT e.event_type, count(*) AS n,
        |       round(max(cut.p95), 4) AS p95,
        |       CAST(sum(CASE WHEN e.value > cut.p95 THEN 1 ELSE 0 END) AS BIGINT) AS n_above
        |FROM events e JOIN cut USING (event_type)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_cohort_retention" ->
      """WITH cohort AS (
        |  SELECT user_id, date_trunc('day', min(ts)) AS cohort_day
        |  FROM events GROUP BY 1
        |)
        |SELECT c.cohort_day, CAST(date_diff('day', CAST(c.cohort_day AS DATE),
        |         CAST(e.ts AS DATE)) // 7 AS BIGINT) AS week,
        |       CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_active
        |FROM events e JOIN cohort c USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
  )
}
