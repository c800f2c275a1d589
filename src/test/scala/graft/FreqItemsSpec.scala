package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.FreqItemsAgg
import graft.ops.CorpusStats

/** graft.functions.FreqItemsAgg — Misra-Gries heavy hitters: exactness
  * when the vocabulary fits, the frequency guarantee when it doesn't,
  * and the plan shape (ObjectHashAggregate, partial aggregation).
  */
class FreqItemsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def toks = CorpusStats.tokens(
    spark.read.parquet(s"$sfTiny/documents.parquet"),
    col("text"), col("doc_id"))

  test("exact when distinct values fit in capacity, any partitioning") {
    val exact = toks.groupBy(col("tok")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact.size <= 256, s"testdata vocab grew past capacity: ${exact.size}")
    for (parts <- Seq(1, 7)) {
      val got = CorpusStats.heavyHitterTokens(
          toks.repartition(parts), capacity = 256)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == exact, s"parts=$parts")
    }
  }

  test("guarantee under eviction: no false negatives above n/(k+1), undercount only") {
    // skewed synthetic stream: item i of 50 appears 2^min(i,9) times
    val rows = (0 until 50).flatMap(i => Seq.fill(1 << math.min(i, 9))(s"item_$i"))
    val n = rows.size.toLong
    val k = 8
    val truth = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val est = rows.toDF("v").repartition(5)
      .agg(FreqItemsAgg.freqItems(col("v"), k).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item"), col("e.est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.size <= k)
    val bound = n / (k + 1)
    for ((item, c) <- truth if c > bound)
      assert(est.contains(item), s"$item (count $c > $bound) missing")
    for ((item, e) <- est) {
      assert(e <= truth(item), s"$item overcounted: $e > ${truth(item)}")
      assert(truth(item) - e <= bound, s"$item undercount ${truth(item) - e} > $bound")
    }
  }

  test("output sorted by est desc then item; grouped use works") {
    val df = Seq(("a", "x"), ("a", "x"), ("a", "y"), ("b", "z"))
      .toDF("g", "v")
      .groupBy(col("g"))
      .agg(FreqItemsAgg.freqItems(col("v"), 4).as("hh"))
    val m = df.collect().map(r => r.getString(0) ->
      r.getSeq[org.apache.spark.sql.Row](1).map(e => (e.getString(0), e.getLong(1)))).toMap
    assert(m("a") == Seq(("x", 2L), ("y", 1L)))
    assert(m("b") == Seq(("z", 1L)))
  }

  test("plan: ObjectHashAggregate with partial aggregation (map-side combine)") {
    val plan = toks.agg(FreqItemsAgg.freqItems(col("tok"), 16))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan.take(1500))
    assert(plan.contains("partial_graft_freq_items"), plan.take(1500))
  }
}
