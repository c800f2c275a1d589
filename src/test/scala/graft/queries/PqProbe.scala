package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** PQ scale probe (dev harness): memory ratio, mean recall@10 over a
  * query panel, and the ADC-scan vs exact-brute wall at sf0.1 and ×16
  * — the numbers behind SCALE.md's product-quantization entry.
  * Copies are structure-preserving like ScaleProbe's builder: ids
  * offset per copy, one coordinate shifted so copies do not collapse
  * into identical vectors. */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.shuffle.sort.bypassMergeThreshold", "0")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val n1 = emb.count()
    val model = Similarity.pqTrain(emb, col("vec_id"), col("embedding"))
    println(s"model: m=${model.m} kc=${model.kc} dsub=${model.dsub} " +
      s"codebook=${model.codebookFlat.length * 8} bytes")
    println(f"memory/vector: raw=${model.dims * 8} B  codes=${model.m} B " +
      f"(BINARY, one byte/subspace; ${model.dims * 8.0 / model.m}%.0fx smaller)")

    def copies(df: DataFrame, k: Int): DataFrame =
      (0 until k).map { i =>
        df.select((col("vec_id") + lit(i * 1000000L)).as("vec_id"),
          transform(col("embedding"),
            (x, p) => when(p === 0, x + lit(i.toFloat)).otherwise(x))
            .as("embedding"))
      }.reduce(_ union _)

    // recall panel: 20 queries, exact brute vs ADC-only vs reranked(50)
    val qids = (1L to 20L)
    val corpus = emb
    val codes = Similarity
      .pqEncodeCorpus(corpus, col("vec_id"), col("embedding"), model).cache()
    codes.count()
    val model16 = Similarity.pqTrain(emb, col("vec_id"), col("embedding"),
      m = 16, kc = 16)
    val codes16 = Similarity
      .pqEncodeCorpus(corpus, col("vec_id"), col("embedding"), model16).cache()
    codes16.count()
    var sAdc = 0.0
    var sRr50 = 0.0
    var sRr200 = 0.0
    var sAdc16 = 0.0
    var sRr50m16 = 0.0
    qids.foreach { qid =>
      val qRow = emb.filter(col("vec_id") === qid)
      val q = qRow.select(col("embedding").cast("array<double>"))
        .head.getSeq[Double](0)
      val rest = corpus.filter(col("vec_id") =!= qid)
      val exact = Similarity.bruteForceTopK(rest, col("vec_id"),
          col("embedding"), qRow, col("embedding"), 10)
        .collect().map(_.getLong(0)).toSet
      def rec(cs: org.apache.spark.sql.DataFrame, mdl: Similarity.PqModel,
          depth: Int): Double = {
        val got = Similarity.pqTopK(cs.filter(col("id") =!= qid),
            col("id"), col("codes"), q, 10, mdl,
            rerank = if (depth > 0) rest else null,
            rerankIdCol = col("vec_id"), rerankVecCol = col("embedding"),
            rerankDepth = depth)
          .collect().map(_.getLong(0)).toSet
        (exact & got).size / 10.0
      }
      sAdc += rec(codes, model, 0)
      sRr50 += rec(codes, model, 50)
      sRr200 += rec(codes, model, 200)
      sAdc16 += rec(codes16, model16, 0)
      sRr50m16 += rec(codes16, model16, 50)
    }
    val nq = qids.size
    println(f"recall@10 over $nq queries (corpus $n1): " +
      f"m8: adc=${sAdc / nq}%.2f rr50=${sRr50 / nq}%.2f rr200=${sRr200 / nq}%.2f | " +
      f"m16: adc=${sAdc16 / nq}%.2f rr50=${sRr50m16 / nq}%.2f")

    // scan wall: rank the whole corpus for one query, ADC vs exact
    // brute — min-of-3, fresh frame per run (the Bench convention)
    val q = emb.filter(col("vec_id") === 7L)
      .select(col("embedding").cast("array<double>")).head.getSeq[Double](0)
    for (scale <- Seq(1, 16)) {
      val big = if (scale == 1) emb else copies(emb, scale)
      val bigCodes = Similarity
        .pqEncodeCorpus(big, col("vec_id"), col("embedding"), model).cache()
      val nRows = bigCodes.count()
      val bigVecs = big.cache()
      bigVecs.count()
      def mintime(f: => Unit): Double =
        (1 to 3).map { _ =>
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }.min
      val tAdc = mintime {
        Similarity.pqTopK(bigCodes, col("id"), col("codes"), q, 10, model)
          .collect()
      }
      val tBrute = mintime {
        val qRow = emb.filter(col("vec_id") === 7L)
        Similarity.bruteForceTopK(bigVecs, col("vec_id"), col("embedding"),
          qRow, col("embedding"), 10).collect()
      }
      println(f"x$scale ($nRows rows): adc-scan=$tAdc%.3f s  " +
        f"exact-brute=$tBrute%.3f s")
      // IVF-PQ: the probe reads nprobe of nClusters PARTITIONS of
      // 8-byte codes — time it against the full ADC scan above
      if (scale == 16) {
        val centroids = Similarity.ivfCentroids(big, col("vec_id"),
          col("embedding"))
        val dir = java.nio.file.Files
          .createTempDirectory("graft_pqprobe_idx").toString
        Similarity.ivfPqIndex(big, col("vec_id"), col("embedding"),
            centroids, model)
          .write.mode("overwrite").partitionBy("cid").parquet(dir)
        val idx = spark.read.parquet(dir)
        val tProbe = mintime {
          Similarity.ivfPqTopK(idx, q, 10, centroids, model, nprobe = 4)
            .collect()
        }
        println(f"x$scale ivf-pq probe (nprobe 4/16, cid-partitioned " +
          f"codes on disk): $tProbe%.3f s")
      }
      bigCodes.unpersist(); bigVecs.unpersist()
    }
    spark.stop()
  }
}
