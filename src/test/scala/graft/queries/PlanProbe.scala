package graft.queries

import org.apache.spark.sql.SparkSession

/** Throwaway plan probe: prints the AQE-final executed plan of the
  * queries named in args (default q_dedup_embed_lsh) at sf0.1. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.TestSpark.spark
    val names = if (args.nonEmpty) args.toSeq else Seq("q_dedup_embed_lsh")
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.1")
      df.count()
      println(s"===== $n =====")
      println(df.queryExecution.executedPlan.toString.take(8000))
    }
    spark.stop()
  }
}
