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

  test("saltedJoin un-forced: the replicated dim is the broadcast build side") {
    val o = queries.t(spark, sfTiny, "orders")
      .select(col("o_orderkey"), col("o_custkey").as("c_custkey"))
    val c = queries.t(spark, sfTiny, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    val salted = ops.Skew.saltedJoin(o, c, "c_custkey",
      saltFrom = col("o_orderkey"), n = 4)
    val plan = salted.queryExecution.executedPlan.toString
    // regression gate: size-only estimation once put the broadcast on
    // the FACT side (BuildLeft) — the replicated dim (the right side)
    // must be the build side at any scale
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
    assert(plan.contains("BuildRight"), s"replicated dim must be the build side:\n$plan")
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

  test("hotKeys surfaces the planted hot key; partialSaltedJoin equals the plain join") {
    import spark.implicits._
    // 2000 rows of one hot key + a long cold tail
    val skewed = ((1 to 2000).map(_ => "HOT") ++ (1 to 500).map(i => s"k$i"))
      .zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("key", "rid")
    val small = ("HOT" +: (1 to 500).map(i => s"k$i")).zipWithIndex
      .map { case (k, i) => (k, s"payload$i") }.toDF("key", "payload")

    val hot = ops.Skew.hotKeys(skewed, col("key"), threshold = 0.1, capacity = 64)
    assert(hot.contains("HOT"), s"hot=$hot")
    // the cold tail (each key 1/2500 of rows) must not flood the list
    assert(hot.size < 10, s"hot=$hot")

    val got = ops.Skew.partialSaltedJoin(skewed, small, "key",
      saltFrom = col("rid"), hot = hot, n = 8)
    val want = skewed.join(small, "key")
    assert(got.count() == want.count())
    assert(got.select("key", "rid", "payload").collect().map(_.toString).sorted.toSeq ==
      want.select("key", "rid", "payload").collect().map(_.toString).sorted.toSeq)
    // hot rows really spread: the salted left carries >1 distinct salt
    // for the hot key and exactly salt 0 for cold keys
    val saltedLeft = skewed.withColumn("__salt",
      when(col("key").isin(hot: _*), ops.Skew.salt(col("rid"), 8)).otherwise(lit(0L)))
    assert(saltedLeft.filter(col("key") === "HOT")
      .select("__salt").distinct().count() > 1)
    assert(saltedLeft.filter(col("key") =!= "HOT")
      .select("__salt").distinct().count() == 1)
    // replication is partial: |small| + (n-1)*|hot| rows, not n*|small|
    val repl = small.withColumn("__salt", explode(
      when(col("key").isin(hot: _*),
        array((0 until 8).map(i => lit(i.toLong)): _*))
        .otherwise(array(lit(0L))))).count()
    assert(repl == small.count() + 7 * hot.size)
  }

  test("partialSaltedJoin with no hot keys degenerates to the plain join") {
    import spark.implicits._
    val l = Seq(("a", 1L), ("b", 2L)).toDF("key", "rid")
    val r = Seq(("a", "x"), ("b", "y")).toDF("key", "payload")
    val got = ops.Skew.partialSaltedJoin(l, r, "key", col("rid"), hot = Nil, n = 8)
    assert(got.count() == 2)
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
