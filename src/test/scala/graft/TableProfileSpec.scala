package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TableProfile

/** graft.ops.TableProfile — exact metrics exact, sketched metrics in
  * bounds, and the whole profile in ONE aggregate job. */
class TableProfileSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val orders = queries.t(spark, sfTiny, "orders")

  test("null counts, min/max exact; approx distinct within HLL bounds") {
    val prof = TableProfile.profile(orders,
      Seq("o_orderkey", "o_orderstatus", "o_totalprice")).map(p => p.column -> p).toMap
    val n = orders.count()
    assert(prof("o_orderkey").rows == n && prof("o_orderkey").nulls == 0)
    val exactKeys = orders.select("o_orderkey").distinct().count()
    val approx = prof("o_orderkey").approxDistinct
    assert(math.abs(approx - exactKeys).toDouble / exactKeys < 0.15,
      s"HLL estimate $approx vs $exactKeys")
    val mm = orders.agg(min("o_totalprice"), max("o_totalprice")).head()
    assert(prof("o_totalprice").min.get.toDouble == mm.getDouble(0))
    assert(prof("o_totalprice").max.get.toDouble == mm.getDouble(1))
  }

  test("string heavy hitters surface the true top values with exact counts") {
    val prof = TableProfile.profile(orders, Seq("o_orderstatus")).head
    // 3 statuses, capacity 16 >> 3 → Misra-Gries is exact here
    val want = orders.groupBy("o_orderstatus").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = prof.topItems.toMap
    assert(got == want)
    assert(prof.topItems.map(_._2) == prof.topItems.map(_._2).sorted.reverse)
  }

  test("null rate reflects injected nulls") {
    val withNulls = orders.withColumn("maybe",
      when(col("o_orderkey") % 4 === 0, col("o_orderstatus")))
    val p = TableProfile.profile(withNulls, Seq("maybe")).head
    val expected = withNulls.filter(col("maybe").isNull).count()
    assert(p.nulls == expected && p.nullRate > 0.5)
  }

  test("the full profile is one job over one scan") {
    val aggsPlan = orders.agg(
        count(lit(1)), sum(when(col("o_orderstatus").isNull, 1L).otherwise(0L)),
        approx_count_distinct(col("o_orderstatus")),
        graft.functions.FreqItemsAgg.freqItems(col("o_orderstatus"), 8))
      .queryExecution.executedPlan.toString
    val scans = "(?i)Scan parquet".r.findAllIn(aggsPlan).length
    assert(scans == 1, s"expected one scan:\n$aggsPlan")
  }
}
