package graft.queries

import org.apache.spark.sql.functions._

/** Throwaway micro-timer: times sub-plans of q_dedup_embed_lsh. */
object TimeProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.TestSpark.spark
    val d = "/root/testdata/sf0.1"
    graft.functions.GraftFunctions.register(spark)
    def time(name: String)(f: => Long): Unit = {
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[probe] $name%-28s min=${ts.map(_._1).min}%.3f s (n=${ts.head._2})")
    }
    // warm cache
    graft.SparkEntry.queries("q_similarity_cosine")(spark, d).count()
    val e0 = ExtendedQueries.embedNorms(spark, d)
    time("norms_only_agg") { e0.agg(count(col("nrm"))).head.getLong(0) }
    time("bucket_agg") {
      e0.withColumn("bucket",
          graft.ops.Similarity.lshBucketQuantized(col("v"), nBits = 8))
        .agg(count(col("bucket"))).head.getLong(0)
    }
    time("full_query") {
      graft.SparkEntry.queries("q_dedup_embed_lsh")(spark, d).count()
    }
    spark.stop()
  }
}
