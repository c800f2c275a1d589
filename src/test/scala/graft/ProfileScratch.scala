package graft

import org.apache.spark.sql.SparkSession

/** Throwaway profiling harness (not part of the driver contract). */
object ProfileScratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.shuffle.sort.bypassMergeThreshold", "0")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = args.toSeq match {
      case Seq() => Seq("q_dedup_embed_topk")
      case xs    => xs
    }
    // mirror Bench warm-up
    spark.range(1000000).selectExpr("sum(id)").collect()
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      println(s"=== $n plan ===")
      df.explain("formatted")
      (1 to 4).foreach { i =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).count()
        println(f"[$n run $i] ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    spark.stop()
  }
}
