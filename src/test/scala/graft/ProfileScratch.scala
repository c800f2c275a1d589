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
    if (sys.env.get("SPARK_GRAFT_PHASES").contains("1")) {
      // per-phase floor breakdown: build / analyze / optimize /
      // physical-plan / execute, min of 3 fresh plans each
      println(f"${"query"}%-24s ${"build"}%7s ${"analyze"}%7s ${"optim"}%7s ${"plan"}%7s ${"exec"}%7s ${"total"}%7s")
      names.foreach { n =>
        val t = Array.fill(6)(Double.MaxValue)
        (1 to 3).foreach { _ =>
          val t0 = System.nanoTime()
          val df = SparkEntry.queries(n)(spark, sfDir)
          val t1 = System.nanoTime()
          val qe = df.queryExecution
          qe.assertAnalyzed()
          val t2 = System.nanoTime()
          qe.optimizedPlan
          val t3 = System.nanoTime()
          qe.executedPlan
          val t4 = System.nanoTime()
          df.count()
          val t5 = System.nanoTime()
          val d = Seq(t1 - t0, t2 - t1, t3 - t2, t4 - t3, t5 - t4, t5 - t0).map(_ / 1e9)
          (0 until 6).foreach(i => t(i) = math.min(t(i), d(i)))
        }
        println(f"$n%-24s ${t(0)}%7.3f ${t(1)}%7.3f ${t(2)}%7.3f ${t(3)}%7.3f ${t(4)}%7.3f ${t(5)}%7.3f")
      }
    } else if (sys.env.get("SPARK_GRAFT_JOBS").contains("1")) {
      // per-JOB stage breakdown of one benchAction: which jobs a query
      // launches and how many stages each schedules — the floor-
      // multiplier map (stage-count work, r16 verdict #3)
      names.foreach { n =>
        // warm: memo/cache builds happen here, matching Bench's
        // prebuilt-artifact convention, so the counted run is the
        // steady-state per-invocation shape
        Bench.benchAction(SparkEntry.queries(n)(spark, sfDir))
        val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (String, Int, Int)]()
        val l = new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(
              j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
            val desc = j.stageInfos.sortBy(_.stageId).map(_.name.takeWhile(_ != '\n'))
              .mkString(" | ")
            val skipped = j.stageInfos.count(_.submissionTime.isEmpty)
            jobs.put(j.jobId, (desc.take(90), j.stageIds.size, skipped))
          }
        }
        spark.sparkContext.addSparkListener(l)
        try {
          val t0 = System.nanoTime()
          Bench.benchAction(SparkEntry.queries(n)(spark, sfDir))
          val wall = (System.nanoTime() - t0) / 1e9
          Thread.sleep(500)
          println(f"=== $n: ${jobs.size} jobs, " +
            f"${jobs.values.stream.mapToInt(_._2).sum} stages, $wall%.2f s ===")
          import scala.jdk.CollectionConverters._
          jobs.asScala.toSeq.sortBy(_._1).foreach { case (id, (d, st, sk)) =>
            println(f"  job $id%3d  stages=$st%3d  $d")
          }
        } finally spark.sparkContext.removeSparkListener(l)
      }
    } else names.foreach { n =>
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
