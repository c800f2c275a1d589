package graft.queries

import org.apache.spark.sql.functions._

/** Throwaway probe: does column pruning reach the parquet scan below
  * the memoized fan-out repartition (eventProfile/docProfile)? */
object PruneProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.TestSpark.spark
    val d = "/root/testdata/sf0.1"
    def schemas(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.executedPlan.toString.linesIterator
        .filter(_.contains("ReadSchema")).map(_.trim.takeRight(120)).mkString("\n")
    val ev = graft.queries.t(spark, d, "events")
    println("== no repartition ==")
    println(schemas(ev.select(col("event_id"), col("props"))))
    println("== repartition then select ==")
    println(schemas(ev.repartition(spark.sparkContext.defaultParallelism)
      .select(col("event_id"), col("props"))))
    println("== select then repartition ==")
    println(schemas(ev.select(col("event_id"), col("props"))
      .repartition(spark.sparkContext.defaultParallelism)))
    spark.stop()
  }
}
