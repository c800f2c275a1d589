package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off A/B: ObjectHashAggregate sort-based fallback threshold on
  * the corpus-cardinality typed aggregate (minHashSignaturesFast
  * groups |shingles| rows by doc id — far beyond the 128-key default,
  * so every partition silently degrades to sort-based aggregation).
  *
  * RESULT (sf0.1 and ×16 risk corpus, interleaved runs): no
  * measurable difference — 0.80 s (128) vs 0.82 s (10⁷) at ×16. The
  * per-shingle MD5 work dominates; the fallback's group-key sort is
  * noise. Conclusion recorded in SCALE.md (Aggregation): the
  * threshold stays at its default. */
object ObjHashProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.shuffle.sort.bypassMergeThreshold", "0")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def run(): Double = {
      val docs = spark.read.parquet(s"$d/documents.parquet")
        .select(col("doc_id"), col("text"))
      val sh = graft.ops.Dedup.shingles(docs, col("text"), col("doc_id"), 3)
      val sig = graft.ops.Dedup.minHashSignaturesFast(sh, 8)
      val t0 = System.nanoTime()
      sig.agg(sum(length(col("m0")))).head()
      (System.nanoTime() - t0) / 1e9
    }
    for (thr <- Seq("128", "128", "10000000", "10000000", "128", "10000000")) {
      spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", thr)
      println(f"[objhash] thr=$thr%-9s ${run()}%6.3f s")
    }
  }
}
