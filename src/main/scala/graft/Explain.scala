package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the executed plan of one declared query —
  * `sbt "runMain graft.Explain q_rsi /root/testdata/sf0.1"`.
  * The fastest loop for the plan-shape audits PlanSpec pins down
  * (exchange counts, WindowExec fusion, pushed filters, ReadSchema):
  * explain here first, gate the shape in PlanSpec once it's right.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Explain <query_name> [sfDir] [mode]")
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val mode = if (args.length > 2) args(2) else "formatted"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query '$name' — keys: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
    fn(spark, sfDir).explain(mode)
    spark.stop()
  }
}
