package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-group quantiles as ONE rank window + a layout-reusing
  * final aggregate — the declared-plan replacement for Spark's
  * interpreted percentile / percentile_disc aggregates (r15
  * honest-bench finding: each ObjectHashAggregate percentile over
  * 600 k rows costs ~0.25-0.30 s of per-row interpreted map updates —
  * three of them made q_percentile_disc 0.94 s while DuckDB reads
  * 0.02 s; the same aggregates were the real cost inside
  * q_agg_median, q_quantiles_multi, q_quantile_sketch_band and
  * q_sketch_rollup_band's exact verification side).
  *
  * The window form pays ONE hash exchange on the group key + one
  * per-group sort, all inside codegen; every ADDITIONAL quantile is
  * one conditional aggregate column on the same pass, not another
  * interpreted map. The final groupBy reuses the window's hash
  * layout, so no second exchange exists. The per-group sort is the
  * honest cost of exactness at any scale — |groups| bounds the sort
  * parallelism like any per-key window — and the sketch band queries
  * (q_quantile_sketch_band, q_sketch_rollup_band) declare the 100 TB
  * approximate path this exact form cross-checks.
  *
  * Semantics, mirrored decision-for-decision:
  *  - disc (SQL PERCENTILE_DISC): the smallest value whose cume_dist
  *    — rn/n as DOUBLE — is >= p. That double comparison is exactly
  *    what Spark's PercentileDisc and DuckDB's quantile_disc make, so
  *    the cross-engine agreement the original aggregate established
  *    carries over unchanged. A ceil(p*n)-index formulation would
  *    NOT: 0.4*120000 computes above 48000 in binary, and ceil lands
  *    one element late where the cumulative comparison does not.
  *  - cont (SQL PERCENTILE_CONT / DuckDB quantile_cont): interpolate
  *    at h = p*(n-1) with the TWO-SIDED weighted form both engines
  *    implement — (ceil(h)-h)*v_lo + (h-floor(h))*v_hi, v_lo alone at
  *    the h-integral boundary. NOT the algebraically-equal
  *    v_lo + frac*(v_hi-v_lo): that form differs at the ULP (measured
  *    139791.9725 vs ...250000003 on sf0.001 orders), and the
  *    BehaviorSpec parity test pins bit-for-bit agreement with the
  *    SQL surface.
  *
  * Output: the group column (original name), one column per requested
  * quantile (given names), plus `__n_rows` (the group's row count).
  * Values must be non-null (ranks would count null rows).
  */
object Quantiles {

  def exactByGroup(df: DataFrame, groupCol: Column, v: Column,
      disc: Seq[(String, Double)] = Nil,
      cont: Seq[(String, Double)] = Nil): DataFrame = {
    require(disc.nonEmpty || cont.nonEmpty, "request at least one quantile")
    val gname = df.select(groupCol).columns.head
    // RANGE-partition the one exchange instead of letting the window
    // hash-partition: RangePartitioning(__g) satisfies the window's
    // ClusteredDistribution AND the caller's terminal ORDER BY group
    // (Spark's prefix rule), so the usual Exchange(rangepartitioning)
    // above the aggregate — whose RangePartitioner SAMPLING pass
    // re-executes the whole rank-window + aggregate chain as a
    // separate job — never plans at all. Measured at sf0.1: the trio
    // of quantile queries dropped ~0.2 s each, entirely the second
    // window execution. Group skew is no worse than hash: either way
    // a group is one partition.
    val base = df.select(groupCol.as("__g"), v.as("__v"))
      .repartitionByRange(
        df.sparkSession.sessionState.conf.numShufflePartitions, col("__g"))
    // both window functions share ONE spec (same partition + order;
    // the count takes the unbounded frame) so they plan as a single
    // WindowExec — one exchange, one sort, one pass
    val spec = Window.partitionBy(col("__g")).orderBy(col("__v"))
    val ranked = base
      .withColumn("__rn", row_number().over(spec))
      .withColumn("__n", count(lit(1)).over(
        spec.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    val cume = col("__rn").cast("double") / col("__n").cast("double")
    val discAggs: Seq[Column] = disc.map { case (name, p) =>
      min(when(cume >= p, col("__v"))).as(name)
    }
    val contAggs: Seq[Column] = cont.flatMap { case (name, p) =>
      val lo = floor(lit(p) * (col("__n") - 1).cast("double")).cast("long") + 1
      Seq(
        max(when(col("__rn") === lo, col("__v"))).as(s"__lo_$name"),
        max(when(col("__rn") === lo + 1, col("__v"))).as(s"__hi_$name"))
    }
    val aggs = discAggs ++ contAggs :+ max(col("__n")).as("__n_rows")
    val aggd = ranked.groupBy(col("__g")).agg(aggs.head, aggs.tail: _*)
    val contFinals: Seq[Column] = cont.map { case (name, p) =>
      val h = lit(p) * (col("__n_rows") - 1).cast("double")
      val vLo = col(s"__lo_$name")
      val vHi = coalesce(col(s"__hi_$name"), vLo)
      when(ceil(h) === floor(h), vLo)
        .otherwise((ceil(h) - h) * vLo + (h - floor(h)) * vHi)
        .as(name)
    }
    aggd.select(col("__g").as(gname) +:
      (disc.map(q => col(q._1)) ++ contFinals) :+ col("__n_rows"): _*)
  }
}
