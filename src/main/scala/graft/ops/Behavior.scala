package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-log behavioral analytics: ordered conversion funnels and
  * cohort retention — the product-analytics jobs that run next to
  * sessionization on the same event stream.
  *
  * 100 TB shape: every step aggregates per user FIRST (map-side
  * combinable — the exchange carries |users| rows, never raw events),
  * then joins user-level frames, which co-partition on the user key
  * at scale. Stage gates are min-timestamp comparisons (exact micros)
  * and retention buckets integer day arithmetic — deterministic under
  * any partitioning.
  */
object Behavior {

  /** Per-user first-completion times of an ORDERED stage sequence:
    * a user completes stage k only with an event of `stages(k)` at or
    * after their stage-(k-1) completion time. Output: one row per
    * user that completed stage 1, with columns `t_<stage>` (null once
    * the user drops out — later stages are inner-joined away; the
    * frame for stage counting is [[funnelCounts]]). */
  def funnelTimes(events: DataFrame, userCol: Column, typeCol: Column,
      tsCol: Column, stages: Seq[String]): Seq[DataFrame] = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val first = events.filter(typeCol === stages.head)
      .groupBy(userCol.as("user_id"))
      .agg(min(tsCol).as(s"t_${stages.head}"))
    stages.tail.foldLeft(Seq(first)) { (acc, stage) =>
      val prevT = col(s"t_${stages(acc.size - 1)}")
      val next = events.filter(typeCol === stage)
        .select(userCol.as("user_id"), tsCol.as("__ts"))
        .join(acc.last, "user_id")
        .filter(col("__ts") >= prevT)
        .groupBy(col("user_id"))
        .agg(min(col("__ts")).as(s"t_$stage"))
      acc :+ next
    }
  }

  /** One-row funnel summary: `n_<stage>` = users who reached each
    * stage in order. Monotone non-increasing by construction.
    *
    * Same semantics as chaining [[funnelTimes]] (spec-asserted), but
    * ONE exchange instead of a join per stage: each stage's
    * first-completion time is a conditional window min over the user
    * partition (`min(ts | type = stage ∧ ts ≥ t_prev)` — t_prev is
    * partition-constant, so the chain is k unsorted window passes over
    * the same hash layout), the per-user collapse reuses that layout,
    * and only the final 1-row count crosses partitions. */
  def funnelCounts(events: DataFrame, userCol: Column, typeCol: Column,
      tsCol: Column, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
    var df = events.select(userCol.as("user_id"), typeCol.as("__type"),
      tsCol.as("__ts"))
    var prev: Option[Column] = None
    stages.foreach { stage =>
      val cond = prev match {
        case None    => col("__type") === stage
        case Some(p) => col("__type") === stage && col("__ts") >= p
      }
      df = df.withColumn(s"t_$stage", min(when(cond, col("__ts"))).over(w))
      prev = Some(col(s"t_$stage"))
    }
    df.groupBy(col("user_id"))
      .agg(max(col(s"t_${stages.head}")).as(s"t_${stages.head}"),
        stages.tail.map(st => max(col(s"t_$st")).as(s"t_$st")): _*)
      .agg(count(col(s"t_${stages.head}")).as(s"n_${stages.head}"),
        stages.tail.map(st => count(col(s"t_$st")).as(s"n_$st")): _*)
  }

  /** Weekly cohort retention: users bucketed by first-seen day,
    * distinct active users per (cohort day, week index).
    *
    * The cohort day is a window min over the user partition — the
    * per-user aggregate rides along each event row without the
    * aggregate+self-join round trip (one exchange on user, then the
    * distinct-count exchange on the output key; nothing else). */
  def cohortRetention(events: DataFrame, userCol: Column,
      tsCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
    events.select(userCol.as("user_id"), tsCol.as("__ts"))
      .withColumn("cohort_day",
        date_trunc("day", min(col("__ts")).over(w)).cast("timestamp_ntz"))
      .select(col("user_id"), col("cohort_day"),
        (datediff(col("__ts").cast("date"), col("cohort_day").cast("date"))
          .cast("long") / 7).cast("long").as("week"))
      .groupBy(col("cohort_day"), col("week"))
      .agg(countDistinct(col("user_id")).as("n_active"))
  }
}
