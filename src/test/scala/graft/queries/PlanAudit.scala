package graft.queries

/** One-off audit: for every declared query, flag pushed
  * isnotnull(<computed expression>) filters — the r10 hazard class
  * where a computed nullable join key is re-evaluated per row inside
  * an inferred null filter. A simple attribute (isnotnull(col#12L))
  * is fine; anything with a nested '(' is computed. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = graft.TestSpark.spark
    val d = graft.TestSpark.sfTiny
    val pat = "isnotnull\\(([^()#]*\\([^)]*)\\)".r
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val p = fn(spark, d).queryExecution.executedPlan.toString
        val hits = p.linesIterator.filter(l => l.contains("Filter"))
          .flatMap(l => pat.findAllMatchIn(l).map(_.group(1).take(70)))
          .toSeq.distinct
        if (hits.nonEmpty)
          println(s"[audit] $name: ${hits.mkString(" | ")}")
      } catch { case e: Throwable =>
        println(s"[audit] $name: ERROR ${e.getMessage.take(60)}")
      }
    }
    println("[audit] done")
    spark.stop()
  }
}
