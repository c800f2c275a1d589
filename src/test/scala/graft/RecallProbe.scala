package graft

import org.apache.spark.sql.functions._

/** One-off probe: raw IVF partial-probe recall at each sf (band calibration). */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val d = s"/root/testdata/$sf"
      val e = graft.queries.t(spark, d, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val r = graft.ops.Similarity.ivfRecall(
          e.filter(col("vec_id") >= 10), col("vec_id"), col("v"),
          e.filter(col("vec_id") < 10), col("vec_id"), col("v"),
          k = 10, nClusters = 16, nprobePartial = 4)
        .select(col("qid"), col("recall_partial")).collect()
        .map(row => (row.getLong(0), row.getInt(1))).sortBy(_._1)
      println(s"[probe] $sf recall@10,nprobe=4: " + r.mkString(" "))
    }
  }
}
