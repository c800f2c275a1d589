package graft

/** Dump `explain("formatted")` for named declared queries to files —
  * the plan evidence the optimization rounds commit under `plans/`.
  * Usage: runMain graft.PlanDump <sfDir> <outDir> <suffix> [q1,q2,...]
  * (no list = every declared query). Same session config as Bench so
  * the dumped plans are the ones the bench times (AQE initial plans:
  * `isFinalPlan=false` — the deterministic pre-execution shape; the
  * byte/stage pins carry the executed truth).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val only: Set[String] =
      if (args.length > 3)
        args(3).split(",").map(_.trim).filter(_.nonEmpty).toSet
      else Set.empty
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.shuffle.sort.bypassMergeThreshold", "0")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = new java.io.File(outDir)
    dir.mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
        val plan =
          try fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          catch { case scala.util.control.NonFatal(e) =>
            s"PLAN FAILED: ${e.getMessage}" }
        val f = new java.io.File(dir, s"${name}_$suffix.txt")
        val w = new java.io.PrintWriter(f, "UTF-8")
        try w.write(plan) finally w.close()
        println(s"[plandump] $name -> ${f.getPath}")
      }
    spark.stop()
  }
}
