package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** graft.etl.Layout — the write-time layouts must produce the plan
  * effects that justify them: bucketed joins with NO Exchange, and
  * date filters that prune partitions at the scan. */
class LayoutSpec extends AnyFunSuite {
  import TestSpark._

  test("bucketed join on the bucket key plans without any Exchange") {
    // clean slate: drop catalog entries AND their warehouse locations
    for (t <- Seq("graft_b_orders", "graft_b_customer")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(loc)
      }
    }
    val o = queries.t(spark, sfTiny, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    val c = queries.t(spark, sfTiny, "customer").select("c_custkey", "c_name")
    etl.Layout.writeBucketed(o.withColumnRenamed("o_custkey", "k"), "graft_b_orders", "k", 8)
    etl.Layout.writeBucketed(c.withColumnRenamed("c_custkey", "k"), "graft_b_customer", "k", 8)
    // disable broadcast so the join would otherwise have to shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = etl.Layout.bucketedJoin(spark, "graft_b_orders", "graft_b_customer", "k")
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p)
      assert(!p.contains("Exchange"), s"bucketed join must not shuffle:\n$p")
      assert(joined.count() == queries.t(spark, sfTiny, "orders")
        .join(queries.t(spark, sfTiny, "customer"),
          col("o_custkey") === col("c_custkey")).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", 10L * 1024 * 1024)
  }

  test("date-partitioned layout prunes partitions for a date filter") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    val ev = queries.t(spark, sfTiny, "events")
      .withColumn("d", to_date(col("ts")))
    etl.Layout.writePartitioned(ev, dir, "d")
    val someDay = ev.select(min(col("d"))).head().getDate(0).toString
    val q = spark.read.parquet(dir).filter(col("d") === lit(someDay))
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [") && p.contains("d#"), p)
    // pruned scan reads only the one partition's rows
    val expected = ev.filter(col("d") === lit(someDay)).count()
    assert(q.count() == expected && expected > 0)
  }
}
