package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Evidence for the SCALE.md cluster-delta claim that
  * `spark.sql.adaptive.skewJoin` splits skewed JOIN partitions at
  * runtime (so hand-salting is only needed for aggregation skew,
  * which AQE does not split — `Skew.saltedAgg`'s remit). The spec
  * forces the situation at test scale: one hot key holding most of
  * the left side, broadcast disabled so the join must shuffle, and
  * the skew thresholds lowered to kB so the runtime stats trip the
  * optimization. Gated on the physical plan's AQEShuffleRead being
  * marked `skewed` AND on result parity with the same join under
  * default configs. */
class AqeSkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def withConf[A](pairs: (String, String)*)(f: => A): A = {
    val conf = spark.conf
    val saved = pairs.map { case (k, _) => k -> conf.getOption(k) }
    pairs.foreach { case (k, v) => conf.set(k, v) }
    try f
    finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("AQE splits the hot partition of a skewed shuffle join at runtime") {
    import spark.implicits._
    // left: 60k rows on the hot key, 40 rows elsewhere — one shuffle
    // partition dwarfs the median by far more than any factor setting
    val left = spark.range(60040).select(
      when(col("id") < 60000, lit(7L)).otherwise(col("id") % 20 + 100)
        .as("k"),
      concat(lit("payload_"), col("id")).as("v"))
    val right = (0L to 120L).map(k => (k, s"dim_$k")).toDF("k", "name")

    // global aggregate over the join output: keeps the payload
    // columns alive through the shuffle (so the hot partition's BYTES
    // are skewed, not just its row count) and — unlike a groupBy on
    // the join key — imposes no required distribution on the join
    // output, which would veto OptimizeSkewedJoin (splitting a
    // partition duplicates it, illegal under a downstream
    // hash-distribution requirement; that veto is exactly why
    // aggregation skew still needs Skew.saltedAgg)
    def probe(df: org.apache.spark.sql.DataFrame) =
      df.agg(count(lit(1)).as("n"), sum(length(col("v"))).as("vb"),
        sum(length(col("name"))).as("nb"))

    val got = withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB") {
      val df = probe(left.join(right, "k"))
      val rows = df.collect() // finalize AQE so the skew readers appear
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("AQEShuffleRead"), p.take(3000))
      // the hot partition was split into multiple reader slices
      assert(p.toLowerCase.contains("skewed"),
        s"no skew-split reader in plan:\n${p.take(3000)}")
      rows
    }

    // parity: same aggregate under default configs (broadcast join,
    // no skew handling) — the optimization must not change results
    val expected = probe(left.join(right, "k")).collect()
    assert(got.head == expected.head)
    assert(got.head.getLong(0) == 60040L)
  }
}
