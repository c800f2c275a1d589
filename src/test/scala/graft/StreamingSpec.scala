package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingPipeline

/** The streaming variants must agree with their batch analogs on the
  * same data (SURVEY §2.9: batch queries pin the event-time
  * semantics). Memory sink + processAllAvailable makes the streaming
  * run synchronous. */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val fixtureDir: String = {
    val dir = Files.createTempDirectory("graft_stream").toString
    graft.queries.t(spark, TestSpark.sfTiny, "events")
      .withColumn("ts", col("ts").cast("timestamp"))
      .write.mode("overwrite").parquet(dir)
    dir
  }

  test("streaming tumbling-hour aggregation matches the batch analog") {
    val stream = StreamingPipeline.readEventStream(spark, fixtureDir)
    val q = StreamingPipeline.tumblingHourly(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("tumbling_out").start()
    try {
      q.processAllAvailable()
      val got = spark.table("tumbling_out")
        .select(col("h").cast("timestamp_ntz").as("h"), col("event_type"), col("n"))
        .collect().map(r => (r.get(0).toString, r.getString(1)) -> r.getLong(2)).toMap
      val want = spark.read.parquet(fixtureDir)
        .groupBy(date_trunc("hour", col("ts")).cast("timestamp_ntz").as("h"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .collect().map(r => (r.get(0).toString, r.getString(1)) -> r.getLong(2)).toMap
      assert(got == want)
    } finally q.stop()
  }

  test("stateful sessionize agrees with the batch lag+cumsum sessionizer") {
    import spark.implicits._
    val events = spark.read.parquet(fixtureDir)
      .select(col("event_id"), col("ts").cast("timestamp").as("ts"), col("user_id"))
      .as[StreamingPipeline.Event]
    val got = StreamingPipeline.sessionize(events)
      .collect().map(s => s.user_id -> s.session_id).toMap
    val want = SparkEntry.queries("q_sessionize")(spark, TestSpark.sfTiny)
      .groupBy("user_id").agg(max("session_id").as("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }
}
