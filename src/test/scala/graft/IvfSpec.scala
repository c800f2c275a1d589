package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** graft.ops.Similarity IVF index — determinism and the exhaustive-
  * probe invariant (nprobe == nClusters ⇒ identical to brute force). */
class IvfSpec extends AnyFunSuite {
  import TestSpark._

  private def corpus = spark.read.parquet(s"$sfTiny/embeddings.parquet")
  private def query = corpus.filter(col("vec_id") === 0)

  test("centroids are deterministic across runs") {
    val a = ops.Similarity.ivfCentroids(corpus, col("vec_id"), col("embedding"), k = 8, iters = 2)
    val b = ops.Similarity.ivfCentroids(corpus, col("vec_id"), col("embedding"), k = 8, iters = 2)
    assert(a == b)
    assert(a.size == 8 && a.forall(_._2.size == 64))
  }

  test("model save/load round-trips exactly (cross-session serve path)") {
    val trained = ops.Similarity.ivfCentroids(
      corpus, col("vec_id"), col("embedding"), k = 8, iters = 2)
    val path = java.nio.file.Files.createTempDirectory("graft_ivf")
      .resolve("model").toString
    ops.Similarity.saveIvfModel(spark, path, trained)
    val loaded = ops.Similarity.loadIvfModel(spark, path)
    assert(loaded == trained)
    // a retrain swap-publishes over the live model
    ops.Similarity.saveIvfModel(spark, path, trained.take(4))
    assert(ops.Similarity.loadIvfModel(spark, path) == trained.take(4))
  }

  test("probing every cluster equals brute force exactly") {
    val brute = ops.Similarity.bruteForceTopK(
        corpus.filter(col("vec_id") =!= 0), col("vec_id"), col("embedding"),
        query, col("embedding"), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val ivf = ops.Similarity.ivfTopK(
        corpus.filter(col("vec_id") =!= 0), col("vec_id"), col("embedding"),
        query, col("embedding"), k = 10, nClusters = 8, nprobe = 8, iters = 1)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(ivf == brute)
  }

  test("partial probe returns k results with sane recall") {
    val brute = ops.Similarity.bruteForceTopK(
        corpus.filter(col("vec_id") =!= 0), col("vec_id"), col("embedding"),
        query, col("embedding"), k = 10)
      .collect().map(_.getLong(0)).toSet
    val ivf = ops.Similarity.ivfTopK(
        corpus.filter(col("vec_id") =!= 0), col("vec_id"), col("embedding"),
        query, col("embedding"), k = 10, nClusters = 8, nprobe = 3, iters = 2)
      .collect().map(_.getLong(0)).toSeq
    assert(ivf.size == 10)
    assert(ivf.toSet.subsetOf(
      corpus.collect().map(_.getLong(0)).toSet - 0L))
    // the query's own cluster is always probed — recall is never zero
    assert((ivf.toSet intersect brute).nonEmpty)
  }

  test("batch search with exhaustive probe matches per-query brute force") {
    val queries = corpus.filter(col("vec_id") < 10)
    val batch = ops.Similarity.ivfTopKBatch(
        corpus, col("vec_id"), col("embedding"),
        queries, col("vec_id"), col("embedding"), k = 5,
        nClusters = 8, nprobe = 8, iters = 1)
      .collect()
      .groupBy(_.getLong(0))
      .map { case (qid, rs) =>
        qid -> rs.map(r => (r.getLong(1), r.getDouble(2)))
          .sortBy { case (id, cos) => (-cos, id) }.toSeq
      }
    assert(batch.keySet == (0L until 10L).toSet)
    (0L until 10L).foreach { qid =>
      val brute = ops.Similarity.bruteForceTopK(
          corpus, col("vec_id"), col("embedding"),
          corpus.filter(col("vec_id") === qid), col("embedding"), k = 5)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(batch(qid) == brute, s"query $qid: batch != brute force")
    }
  }

  test("k=256: broadcast-join assignment equals the literal path, and trains end-to-end") {
    // 256 centroids is past AssignLiteralMaxK (64): production code
    // takes the broadcast-relation + min-struct path. Pin maxLiteralK
    // to force EACH path over the same centroid model and require
    // identical assignments (same lower-cid tie-break).
    val base = corpus.select(col("vec_id").as("id"),
      col("embedding").cast("array<double>").as("v"))
    val centroids = ops.Similarity.ivfCentroids(
      corpus, col("vec_id"), col("embedding"), k = 256, iters = 1)
    assert(centroids.size == 256)
    val byJoin = ops.Similarity.assignClusters(base, centroids, maxLiteralK = -1)
      .select(col("id"), col("cid")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    val byLiteral = ops.Similarity.assignClusters(base, centroids,
        maxLiteralK = Int.MaxValue)
      .select(col("id"), col("cid")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    assert(byJoin == byLiteral)
    // plan sanity: the join path's plan size is O(1) in k — no 256-arm
    // least() expression tree
    val plan = ops.Similarity.assignClusters(base, centroids, maxLiteralK = -1)
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("least("), plan.take(500))
    // and the end-to-end batch search (train + assign + probe) runs
    // through the large-k path: exhaustive probe == brute force still
    val q = corpus.filter(col("vec_id") < 3)
    val batch = ops.Similarity.ivfTopKBatch(
        corpus, col("vec_id"), col("embedding"),
        q, col("vec_id"), col("embedding"), k = 3,
        nClusters = 256, nprobe = 256, iters = 1)
      .collect()
      .groupBy(_.getLong(0))
      .map { case (qid, rs) =>
        qid -> rs.map(r => (r.getLong(1), r.getDouble(2)))
          .sortBy { case (id, cos) => (-cos, id) }.toSeq
      }
    (0L until 3L).foreach { qid =>
      val brute = ops.Similarity.bruteForceTopK(
          corpus, col("vec_id"), col("embedding"),
          corpus.filter(col("vec_id") === qid), col("embedding"), k = 3)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(batch(qid) == brute, s"query $qid: large-k batch != brute force")
    }
  }

  test("ivfRecall: full_ids is exactly brute force; recall_partial is a true intersection") {
    val c = corpus.filter(col("vec_id") >= 10)
    val q = corpus.filter(col("vec_id") < 10)
    val r = ops.Similarity.ivfRecall(
        c, col("vec_id"), col("embedding"), q, col("vec_id"), col("embedding"),
        k = 5, nClusters = 8, nprobePartial = 2, iters = 1)
      .collect().map(row => (row.getLong(0),
        row.getSeq[Long](1), row.getInt(2))).sortBy(_._1)
    assert(r.map(_._1).toSeq == (0L until 10L).toSeq)
    r.foreach { case (qid, fullIds, recall) =>
      val brute = ops.Similarity.bruteForceTopK(
          c, col("vec_id"), col("embedding"),
          corpus.filter(col("vec_id") === qid), col("embedding"), k = 5)
        .collect().map(_.getLong(0)).toSeq
      assert(fullIds == brute, s"query $qid: exhaustive probe != brute force")
      assert(recall >= 0 && recall <= 5, s"query $qid: recall out of range")
    }
  }

  test("batch partial probe keeps per-query result count and id domain") {
    val queries = corpus.filter(col("vec_id") < 10)
    val out = ops.Similarity.ivfTopKBatch(
        corpus, col("vec_id"), col("embedding"),
        queries, col("vec_id"), col("embedding"), k = 5,
        nClusters = 8, nprobe = 2, iters = 2)
      .collect()
    val perQuery = out.groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    // every query's own cluster is probed, which holds ≥ the query
    // itself, so each query returns rows; counts are capped at k
    assert(perQuery.keySet == (0L until 10L).toSet)
    assert(perQuery.values.forall(n => n >= 1 && n <= 5))
    val ids = corpus.collect().map(_.getLong(0)).toSet
    assert(out.forall(r => ids.contains(r.getLong(1))))
  }

  test("batch top-k heap equals rank-window selection on a partial probe; WindowExec gone (r11)") {
    // r11 re-plan: ivfTopKBatch's per-query top-k moved from
    // row_number() OVER (PARTITION BY qid) — which sorts the whole
    // candidate set (|corpus|/nClusters × nprobe per query, grows
    // with the corpus) — onto the TopKAgg k-heap. Same selection:
    // compare against the window idiom computed driver-side from the
    // same model's probe candidates (ivfCentroids is deterministic,
    // so a second train with identical params yields the same model).
    val queries = corpus.filter(col("vec_id") < 10)
    def ranked(rows: Array[(Long, Long, Double)], k: Int) =
      rows.groupBy(_._1).view.mapValues(
        _.map(t => (t._2, t._3))
          .sortBy { case (id, cos) => (-cos, id) }.take(k).toSeq).toMap
    val out = ranked(ops.Similarity.ivfTopKBatch(
        corpus, col("vec_id"), col("embedding"),
        queries, col("vec_id"), col("embedding"), k = 5,
        nClusters = 8, nprobe = 2, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))), 5)
    val centroids = ops.Similarity.ivfCentroids(
      corpus, col("vec_id"), col("embedding"), k = 8, iters = 2)
    val assigned = ops.Similarity.assignClusters(
      corpus.select(col("vec_id").as("id"),
        col("embedding").cast("array<double>").as("v")), centroids)
    val expected = ranked(ops.Similarity.ivfProbeCandidates(
        queries, col("vec_id"), col("embedding"), centroids, assigned,
        nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))), 5)
    assert(out == expected)
    // plan gate: no WindowExec anywhere in the literal-path batch
    // search (the large-k probe variant keeps its MODEL-bounded
    // window — nClusters rows per query, corpus-size-independent)
    val plan = ops.Similarity.ivfTopKBatch(
        corpus, col("vec_id"), col("embedding"),
        queries, col("vec_id"), col("embedding"), k = 5,
        nClusters = 8, nprobe = 2, iters = 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan.take(800))
  }
}
