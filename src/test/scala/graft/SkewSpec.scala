package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** graft.ops.Skew — salted plans must be value-identical to their
  * unsalted equivalents (sums go through exact decimal to make the
  * comparison order-independent). */
class SkewSpec extends AnyFunSuite {
  import TestSpark._

  test("saltedAgg equals direct groupBy on lineitem quantities") {
    val li = queries.t(spark, sfTiny, "lineitem")
      .withColumn("q", col("l_quantity").cast("decimal(18,4)"))
    // avg recomputed identically on both sides (decimal-division scale
    // differs between one- and two-phase sums; the exact columns must
    // match bit-for-bit, avg to double precision).
    def withAvg(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("avg_v", (col("sum_v").cast("double") / col("cnt")))
    val direct = withAvg(li.groupBy(col("l_returnflag"))
      .agg(sum(col("q")).as("sum_v"), count(col("q")).as("cnt"),
        min(col("q")).as("min_v"), max(col("q")).as("max_v")))
    val salted = withAvg(ops.Skew.saltedAgg(li, Seq("l_returnflag"), "q",
        saltFrom = col("l_orderkey"), n = 8)
      .drop("avg_v"))
    val d = direct.collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    val s = salted.collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    assert(d == s)
  }

  test("saltedJoin equals plain join on orders x customer") {
    val o = queries.t(spark, sfTiny, "orders")
      .select(col("o_orderkey"), col("o_custkey").as("c_custkey"))
    val c = queries.t(spark, sfTiny, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    val plain = o.join(c, Seq("c_custkey"))
      .select(col("o_orderkey"), col("c_mktsegment"))
    val salted = ops.Skew.saltedJoin(o, c, "c_custkey",
        saltFrom = col("o_orderkey"), n = 4)
      .select(col("o_orderkey"), col("c_mktsegment"))
    assert(plain.count() == salted.count())
    assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty)
  }

  test("saltedJoin forceShuffle: plan shuffles on (key, salt), rows unchanged") {
    val o = queries.t(spark, sfTiny, "orders")
      .select(col("o_orderkey"), col("o_custkey").as("c_custkey"))
    val c = queries.t(spark, sfTiny, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    val salted = ops.Skew.saltedJoin(o, c, "c_custkey",
      saltFrom = col("o_orderkey"), n = 4, forceShuffle = true)
    val plan = salted.queryExecution.executedPlan.toString
    // the shuffle join must exist (no broadcast of the replicated
    // side) and its exchange must carry the salt column
    assert(plan.contains("ShuffledHashJoin"), s"expected shuffle join:\n$plan")
    assert(plan.contains("__salt"), s"expected salt in exchange keys:\n$plan")
    assert(salted.count() ==
      o.join(c, Seq("c_custkey")).count())
  }

  test("salt is deterministic and in range") {
    val s = spark.range(1000)
      .select(ops.Skew.salt(col("id"), 16).as("s"))
    val mm = s.agg(min(col("s")), max(col("s"))).head()
    assert(mm.getLong(0) >= 0 && mm.getLong(1) < 16)
    val a = s.collect().map(_.getLong(0)).toSeq
    val b = s.collect().map(_.getLong(0)).toSeq
    assert(a == b)
  }
}
