package graft.queries
import org.apache.spark.sql.functions._
object SimHashProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.TestSpark.spark
    val docs = spark.read.parquet("/tmp/graft_scale/cx16/documents.parquet")
      .repartition(32)
    docs.cache().count()
    def time(name: String)(f: => Long): Unit = {
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); val n = f; ((System.nanoTime()-t0)/1e9, n) }
      println(f"[shprobe] $name%-18s min=${ts.map(_._1).min}%.3f s (n=${ts.head._2})")
    }
    val sh = docs.select(col("doc_id").as("id"),
      graft.ops.Dedup.shingleArray(col("text"), 3).as("__sh"))
      .filter(col("__sh").isNotNull)
    time("shingles_forced") {
      sh.agg(sum(length(array_join(col("__sh"), ""))), count(lit(1))).head.getLong(1)
    }
    time("minima_kernel") {
      sh.select(col("id"),
          graft.functions.GraftFunctions.minHashMinima(col("__sh"), 8).as("m"))
        .agg(sum(length(array_join(col("m"), ""))), count(lit(1))).head.getLong(1)
    }
    time("minima_hof_j0") {
      sh.select(col("id"),
          graft.ops.Dedup.minOverShingleArray(col("__sh"), 0).as("m"))
        .agg(sum(length(col("m"))), count(lit(1))).head.getLong(1)
    }
    docs.unpersist(); spark.stop()
  }
}
