package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cardinality sketches — SURVEY §2.4's approximate-distinct row.
  *
  * Thin, named wrappers over Spark's built-in HyperLogLog++
  * (`approx_count_distinct`): the sketch merges associatively, so the
  * aggregate is map-side combinable and exchanges O(sketch) bytes per
  * group instead of O(distinct values) — at 100 TB the difference
  * between a metadata-sized shuffle and re-shuffling the corpus
  * (exactly the trade the reference's `COUNT(DISTINCT …)` dashboards
  * would need at scale). `rsd` is the guaranteed relative standard
  * deviation; the spec pins observed error well inside it on the
  * testdata.
  */
object Sketches {

  /** Global approximate distinct count of `col`: one row, one column
    * `approx_distinct`. */
  def approxCountDistinct(df: DataFrame, column: Column,
      rsd: Double = 0.05): DataFrame =
    df.agg(approx_count_distinct(column, rsd).as("approx_distinct"))

  /** Per-group approximate distinct counts: `groupCols` +
    * `approx_distinct`. */
  def approxCountDistinctBy(df: DataFrame, groupCols: Seq[Column],
      column: Column, rsd: Double = 0.05): DataFrame =
    df.groupBy(groupCols: _*)
      .agg(approx_count_distinct(column, rsd).as("approx_distinct"))

  /** Per-group approximate quantiles (Greenwald-Khanna via Spark's
    * `approx_percentile`): the scale path behind q_quantiles_multi's
    * exact percentile — the GK sketch merges associatively (map-side
    * combinable, O(sketch) bytes per group exchanged) where exact
    * percentile collects every value of a group. `accuracy` bounds
    * rank error at 1/accuracy. Output: `groupCols` + `q_0..q_{n-1}`
    * scalar columns in `probs` order. */
  def approxQuantilesBy(df: DataFrame, groupCols: Seq[Column],
      column: Column, probs: Seq[Double],
      accuracy: Int = 10000): DataFrame = {
    val arr = approx_percentile(column,
      array(probs.map(lit): _*), lit(accuracy))
    df.groupBy(groupCols: _*)
      .agg(arr.as("q"))
      .select(groupCols ++
        probs.indices.map(i => element_at(col("q"), i + 1).as(s"q_$i")): _*)
  }

  /** Per-group KLL quantile SKETCHES (DataSketches via Spark's
    * `kll_sketch_agg_double`): unlike [[approxQuantilesBy]] this
    * returns the mergeable binary state itself — persist it, merge
    * snapshots pairwise with `kll_sketch_merge_double`, and read any
    * quantile later with [[kllQuantiles]]; the build/serve split
    * `SketchRollup` uses, exposed standalone. `k` trades size for
    * rank error (k=200 ≈ 1.65% at 99% confidence). Output: groupCols
    * + `kll` BINARY. */
  def kllSketchBy(df: DataFrame, groupCols: Seq[Column], column: Column,
      k: Int = 200): DataFrame =
    df.groupBy(groupCols: _*)
      .agg(kll_sketch_agg_double(column.cast("double"), k).as("kll"))

  /** Quantile estimates from a `kll` sketch column: `q_0..q_{n-1}`
    * in `probs` order, sketch column dropped. */
  def kllQuantiles(sketches: DataFrame, probs: Seq[Double]): DataFrame =
    sketches.select(sketches.columns.filter(_ != "kll").map(col) ++
      probs.zipWithIndex.map { case (p, i) =>
        kll_sketch_get_quantile_double(col("kll"), lit(p)).as(s"q_$i")
      }: _*)
}
