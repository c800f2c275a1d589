package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries._

/** Semantic traps from SURVEY §7.4: union dedup, set ops, md5, case. */
class CoreQueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sfTiny

  test("q_union_distinct deduplicates (Spark union() alone is UNION ALL)") {
    val q = SparkEntry.queries("q_union_distinct")(spark, sf)
    val dedup = q.count()
    val li = t(spark, sf, "lineitem").select(to_date(col("l_shipdate")).as("d"))
    val o = t(spark, sf, "orders").select(to_date(col("o_orderdate")).as("d"))
    val all = li.union(o).count()
    assert(dedup < all, "UNION must have set semantics")
    assert(q.select(col("d")).distinct().count() == dedup)
  }

  test("q_except is non-empty and disjoint from orders dates") {
    val ex = SparkEntry.queries("q_except")(spark, sf)
    assert(ex.count() > 0)
    val oDates = t(spark, sf, "orders")
      .select(to_date(col("o_orderdate")).as("d"))
    assert(ex.join(oDates, Seq("d"), "left_semi").count() == 0)
  }

  test("md5 surrogate key matches the reference definition (lowercase hex)") {
    import spark.implicits._
    val got = Seq("^GSPC").toDF("s").select(md5(col("s").cast("binary"))).head.getString(0)
    assert(got.matches("[0-9a-f]{32}"))
    val ref = java.security.MessageDigest.getInstance("MD5")
      .digest("^GSPC".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got == ref)
  }

  test("q_case_when covers all three tiers with ELSE fallback") {
    val tiers = SparkEntry.queries("q_case_when")(spark, sf)
      .select(col("tier")).distinct().collect().map(_.getString(0)).toSet
    assert(tiers == Set("high", "medium", "low"))
  }

  test("q_sort_limit returns exactly 100 rows in descending price order") {
    val rows = SparkEntry.queries("q_sort_limit")(spark, sf).collect()
    assert(rows.length == 100)
    val prices = rows.map(_.getDouble(1))
    assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
  }
}
