package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** Dev probe (r19): attribute a declared query's scheduled JOBS — one
  * line per job with its stage count and the SQL-execution/callsite
  * description — so a stage-count audit (e.g. q_corpus_clean's ~50)
  * can see WHERE the stages come from instead of guessing.
  * Usage: Test/runMain graft.queries.JobProbe q_corpus_clean
  */
object JobProbe {
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
    spark.range(1000000).selectExpr("sum(id)").collect()
    val names = if (args.nonEmpty) args.toSeq else Seq("q_corpus_clean")
    for (name <- names) {
      // warm the session memos the way Bench's untimed warm-up does,
      // so the attributed run is the TIMED shape, not the build
      graft.Bench.benchAction(graft.SparkEntry.queries(name)(spark, sfDir))
      val jobs = scala.collection.mutable.ArrayBuffer[(Int, Int, String)]()
      val l = new SparkListener {
        override def onJobStart(j: SparkListenerJobStart): Unit = {
          val execId = Option(j.properties)
            .flatMap(p => Option(p.getProperty("spark.sql.execution.id")))
            .getOrElse("-")
          // the result stage's name carries the materializing callsite
          val names = j.stageInfos.map(_.name.takeWhile(_ != '\n')).distinct
          jobs += ((j.jobId, j.stageInfos.size,
            s"exec=$execId  ${names.mkString(" | ").take(160)}"))
        }
      }
      spark.sparkContext.addSparkListener(l)
      val t0 = System.nanoTime()
      graft.Bench.benchAction(graft.SparkEntry.queries(name)(spark, sfDir))
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      spark.sparkContext.removeSparkListener(l)
      println(f"== $name: ${jobs.size} jobs, " +
        f"${jobs.map(_._2).sum} listed stages (incl. re-listed shared), " +
        f"wall $wall%.3f s ==")
      jobs.foreach { case (id, n, desc) =>
        println(f"  job $id%4d  stages=$n%3d  ${desc.take(140)}") }
    }
    spark.stop()
  }
}
