package graft

import org.scalatest.funsuite.AnyFunSuite

/** Partitioning-invariance sweep over the ENTIRE declared inventory:
  * every query must produce byte-identical ordered output when the
  * shuffle-partition count changes (3 vs the suite's 4 — different
  * hash routing, different merge orders, different AQE coalescing).
  * This is the "correct at 1000 executors, not just on this laptop"
  * claim of SCALE.md §7.3 asserted wholesale: an order-dependent
  * double sum, a tie without a tiebreaker, or a first()/head-dependent
  * expression anywhere in any query fails here.
  *
  * Caches are released between passes so memoized frames are rebuilt
  * under the new partitioning rather than replayed.
  */
class DeterminismSpec extends AnyFunSuite {
  import TestSpark._

  test("all declared queries are invariant to the shuffle-partition count") {
    val sf = sfTiny
    def runAll(parts: Int): Map[String, Seq[String]] = {
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      graft.queries.ExtendedQueries.releaseCaches(spark, sf)
      try SparkEntry.queries.map { case (name, fn) =>
        name -> fn(spark, sf).collect().toSeq.map(_.toString)
      }
      finally spark.conf.set("spark.sql.shuffle.partitions", "4")
    }
    val a = runAll(4)
    val b = runAll(3)
    val diffs = a.keys.filter(k => a(k) != b(k)).toSeq.sorted
    assert(diffs.isEmpty,
      s"queries differ across shuffle-partition counts: ${diffs.mkString(", ")}")
  }
}
