package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.etl.StarSchemaBuilder
import graft.ops.{Dedup, Multimodal, Similarity}

/** End-to-end demo of the non-oracle library surface: star-schema ETL
  * from landing CSVs, near-dup detection, ANN search, multimodal
  * plumbing, and the streaming tumbling aggregation — one run, real
  * outputs, printed summaries. */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.001"

    // --- star-schema ETL over a synthetic landing zone ---
    val landing = Files.createTempDirectory("demo_landing").toString
    val dates = Iterator.iterate(java.time.LocalDate.parse("2024-01-01"))(_.plusDays(1))
      .takeWhile(!_.isAfter(java.time.LocalDate.parse("2024-02-15"))).toSeq
    val rows = for { t <- Seq("^GSPC", "^DJI", "^NDX"); (d, i) <- dates.zipWithIndex } yield
      f"$d,$t,100.0,110.0,90.0,${100.0 + i + (if (t == "^DJI") 50 else 0)}%.2f,100.0,${1000L + i}"
    Files.write(java.nio.file.Paths.get(landing, "stocks_2024-02-15.csv"),
      ("Date,Ticker,Open,High,Low,Close,AdjClose,Volume" +: rows).mkString("\n").getBytes)
    Files.write(java.nio.file.Paths.get(landing, "world_bank_2024-02-15.csv"),
      "date,GDPGrowthRate,InflationRate\n2024-01-01,2.5,3.1".getBytes)
    val starOut = Files.createTempDirectory("demo_star").toString
    println(s"[demo] watermark = ${StarSchemaBuilder.lastSavedDate(spark, landing, "stocks")}")
    val star = StarSchemaBuilder.build(spark, landing, starOut)
    star.foreach { case (n, _) =>
      println(s"[demo] $n rows = ${spark.read.parquet(s"$starOut/$n.parquet").count()}") }
    spark.read.parquet(s"$starOut/fact_table.parquet")
      .orderBy(col("IndexKey"), col("DateKey")).show(3)

    // --- near-dup detection on the documents corpus ---
    val docs = queries.t(spark, sf, "documents")
    val cand = Dedup.minHashLshCandidates(docs, col("text"), col("doc_id")).cache()
    println(s"[demo] minhash-lsh candidate pairs = ${cand.count()}")
    val verified = Dedup.ngramJaccardPairs(docs, col("text"), col("doc_id"),
      candidates = Some(cand.toDF("id1", "id2")))
    println(s"[demo] verified near-dups (jac>=0.8) = ${verified.filter(col("jac") >= 0.8).count()}")

    // --- similarity search ---
    val emb = queries.t(spark, sf, "embeddings")
    val q = emb.filter(col("vec_id") === 0)
    val corpus = emb.filter(col("vec_id") =!= 0)
    println("[demo] exact top-5:")
    Similarity.bruteForceTopK(corpus, col("vec_id"), col("embedding"), q, col("embedding"), 5).show()
    println("[demo] lsh top-5 (8-bit buckets):")
    Similarity.lshTopK(corpus, col("vec_id"), col("embedding"), q, col("embedding"), 5, nBits = 4).show()

    // --- multimodal plumbing ---
    val media = Multimodal.syntheticMedia(spark, 50)
    val decoded = Multimodal.decode(media)
    println(s"[demo] media decoded = ${decoded.count()}; " +
      s"frames sampled = ${Multimodal.sampleFrames(decoded, 5000).count()}")

    // --- streaming tumbling agg over an event stream ---
    val streamDir = Files.createTempDirectory("demo_stream").toString
    queries.t(spark, sf, "events").withColumn("ts", col("ts").cast("timestamp"))
      .write.mode("overwrite").parquet(streamDir)
    val sq = graft.streaming.StreamingPipeline
      .tumblingHourly(graft.streaming.StreamingPipeline.readEventStream(spark, streamDir))
      .writeStream.outputMode("complete").format("memory").queryName("demo_tumbling").start()
    sq.processAllAvailable()
    println(s"[demo] streaming tumbling rows = ${spark.table("demo_tumbling").count()}")
    sq.stop()

    spark.stop()
  }
}
