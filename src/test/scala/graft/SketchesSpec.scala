package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Sketches

/** approx_count_distinct (HLL++) vs exact counts on the sf0.01
  * testdata — observed error must sit inside the requested rsd. */
class SketchesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"

  test("global approx distinct within 5% of exact") {
    val li = graft.queries.t(spark, sf, "lineitem")
    val exact = li.select(col("l_partkey")).distinct().count()
    val approx = Sketches.approxCountDistinct(li, col("l_partkey"))
      .head.getLong(0)
    assert(math.abs(approx - exact).toDouble / exact <= 0.05,
      s"approx=$approx exact=$exact")
  }

  test("grouped approx distinct within 5% of exact per group") {
    val li = graft.queries.t(spark, sf, "lineitem")
    val exact = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // rsd is a STANDARD deviation, not a bound — ask for 1% so the
    // ±5% assertion sits at 5σ
    val approx = Sketches.approxCountDistinctBy(li,
        Seq(col("l_returnflag")), col("l_orderkey"), rsd = 0.01)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    for ((k, e) <- exact) {
      val a = approx(k)
      assert(math.abs(a - e).toDouble / e <= 0.05, s"group $k approx=$a exact=$e")
    }
  }

  test("partial aggregation present (map-side combinable sketch)") {
    val li = graft.queries.t(spark, sf, "lineitem")
    val plan = Sketches.approxCountDistinctBy(li,
        Seq(col("l_returnflag")), col("l_orderkey"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_approx_count_distinct"), plan.take(2000))
  }
}
