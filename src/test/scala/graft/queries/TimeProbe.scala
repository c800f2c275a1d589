package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Throwaway micro-timer: decomposes q_expectations' 0.98 s
  * (r15 honest-bench flag, 17x DuckDB). */
object TimeProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.TestSpark.spark
    val d = "/root/testdata/sf0.1"
    def time(name: String)(f: => DataFrame): Unit = {
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); f.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $name%-28s min=${ts.min}%.3f s")
    }
    def li = t(spark, d, "lineitem")
    def o = t(spark, d, "orders")
    li.groupBy(col("l_returnflag")).count().queryExecution.toRdd.count()
    time("row_rules_only") {
      import graft.etl.Expectations
      Expectations.checkFrame(li,
        Seq(Expectations.inRange("l_quantity", 1.0, 30.0),
          Expectations.matches("l_returnflag", "^[AR]$"),
          Expectations.notNull("l_shipdate")))
    }
    time("unique_only") {
      import graft.etl.Expectations
      Expectations.checkFrame(li, Nil,
        uniqueKey = Seq("l_orderkey", "l_linenumber"))
    }
    time("unique_packed_long") {
      li.agg((count(lit(1)) -
        count_distinct(col("l_orderkey") * 8 + col("l_linenumber")))
        .as("v"))
    }
    time("fk_only") {
      import graft.etl.Expectations
      Expectations.checkFrame(li, Nil,
        foreignKeys = Map("fk(l_orderkey->orders)" ->
          ("l_orderkey", o, "o_orderkey")))
    }
    time("full_query") {
      graft.SparkEntry.queries("q_expectations")(spark, d)
    }
    spark.stop()
  }
}
