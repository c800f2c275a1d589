package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** graft.functions.MinHashAgg — the one-pass typed aggregate must be
  * byte-identical to the 8-column min(md5) formulation, and must plan
  * as ObjectHashAggregate (the point of its existence). */
class MinHashAggSpec extends AnyFunSuite {
  import TestSpark._

  private def docShingles = {
    val docs = spark.read.parquet(s"$sfTiny/documents.parquet")
    ops.Dedup.shingles(docs, col("text"), col("doc_id"))
  }

  test("one-pass sketch equals the column formulation exactly") {
    val slow = ops.Dedup.minHashSignatures(docShingles, 8)
    val fast = ops.Dedup.minHashSignaturesFast(docShingles, 8)
    assert(slow.schema.fieldNames.toSeq == fast.schema.fieldNames.toSeq)
    assert(slow.exceptAll(fast).isEmpty && fast.exceptAll(slow).isEmpty)
    assert(slow.count() == fast.count())
  }

  test("plans as ObjectHashAggregate, not SortAggregate") {
    val fast = ops.Dedup.minHashSignaturesFast(docShingles, 8)
    val p = fast.queryExecution.executedPlan.toString
    assert(p.contains("ObjectHashAggregate"), p)
    assert(!p.contains("SortAggregate"), p)
  }

  test("merge across partitions: repartitioned input gives same result") {
    val sh = docShingles
    val a = ops.Dedup.minHashSignaturesFast(sh.repartition(13), 8)
    val b = ops.Dedup.minHashSignaturesFast(sh.coalesce(1), 8)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
