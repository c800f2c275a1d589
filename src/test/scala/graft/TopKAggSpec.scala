package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TopKAgg

/** The bounded top-k aggregate: exact equivalence with the rank
  * window, invariance under partitioning (the mergeability claim),
  * and edge cases (k ≥ group size, ties, nulls). */
class TopKAggSpec extends AnyFunSuite {
  import TestSpark._

  private def viaAgg(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy(col("g"))
      .agg(TopKAgg.topK(col("score"), col("id"), k).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), (col("pos") + 1).as("rk"),
        col("col.id").as("id"), col("col.score").as("score"))
      .orderBy(col("g"), col("rk"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3)))

  private def viaWindow(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.withColumn("rk", row_number().over(
        Window.partitionBy(col("g")).orderBy(col("score").desc, col("id"))))
      .filter(col("rk") <= k)
      .select(col("g"), col("rk"), col("id"), col("score"))
      .orderBy(col("g"), col("rk"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3)))

  test("matches the rank window exactly, including score ties") {
    import spark.implicits._
    val df = Seq(
      ("a", 1L, 5.0), ("a", 2L, 7.0), ("a", 3L, 7.0), ("a", 4L, 1.0),
      ("b", 5L, 2.0), ("b", 6L, 2.0), ("b", 7L, 2.0),
      ("c", 8L, 9.0)).toDF("g", "id", "score")
    for (k <- Seq(1, 2, 3, 10))
      assert(viaAgg(df, k).toSeq == viaWindow(df, k).toSeq, s"k=$k")
  }

  test("partition-count invariant (merge correctness) on real data") {
    val orders = graft.queries.t(spark, sfTiny, "orders")
      .select(col("o_orderpriority").as("g"), col("o_orderkey").as("id"),
        col("o_totalprice").as("score"))
    val expected = viaWindow(orders, 3).toSeq
    for (parts <- Seq(1, 7, 32))
      assert(viaAgg(orders.repartition(parts), 3).toSeq == expected, s"parts=$parts")
  }

  test("null scores and ids are skipped; empty groups yield empty arrays") {
    import spark.implicits._
    val df = Seq(
      ("a", Some(1L), Some(3.0)), ("a", None, Some(9.0)), ("a", Some(2L), None))
      .toDF("g", "id", "score")
    val got = df.groupBy(col("g"))
      .agg(TopKAgg.topK(col("score"), col("id"), 5).as("top"))
      .select(col("g"), size(col("top")).as("n")).head()
    assert(got.getInt(1) == 1) // only the fully-non-null row survives
  }

  test("declared query plan: map-side combine, no sort window") {
    val df = SparkEntry.queries("q_topk_agg")(spark, sfTiny)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Window"), s"rank window leaked into the top-k agg plan:\n$p")
    // partial+final ObjectHashAggregate pair = the O(k)-state exchange
    assert("ObjectHashAggregate".r.findAllIn(p).length >= 2, p)
  }
}
