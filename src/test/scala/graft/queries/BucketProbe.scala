package graft.queries
import org.apache.spark.sql.functions._
object BucketProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.TestSpark.spark
    graft.functions.GraftFunctions.register(spark)
    val emb = spark.read.parquet("/tmp/graft_scale/rx16/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("v"))
      .repartition(32)
    emb.cache().count()
    def e = emb
      .withColumn("bucket", graft.ops.Similarity.lshBucketQuantized(col("v"), nBits = 16))
      .withColumn("nrm", sqrt(expr("graft_dot(v, v)")))
    val a = e.select(col("bucket"), col("id").as("id1"))
    val b = e.select(col("bucket"), col("id").as("id2"))
    val j = a.join(b, "bucket").filter(col("id1") < col("id2"))
    j.count()
    val plan = j.queryExecution.executedPlan.toString
    plan.linesIterator.foreach { l =>
      val t = l.replaceAll("CASE WHEN.*END", "<BUCKET_EXPR>").take(200)
      println("[bplan] " + t)
    }
    spark.stop()
  }
}
