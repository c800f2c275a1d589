package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.TrainPrep

/** graft.ops.TrainPrep — deterministic splits and sequence packing. */
class TrainPrepSpec extends AnyFunSuite {
  import TestSpark._

  private def docs = spark.read.parquet(s"$sfTiny/documents.parquet")

  test("split is deterministic, total, and stable under corpus growth") {
    val labeled = docs.select(col("doc_id"),
      TrainPrep.splitLabel(col("text")).as("split"))
    val a = labeled.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = labeled.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
    assert(a.values.toSet.subsetOf(Set("train", "test", "val")))
    // stability: the label of a doc must not depend on which other
    // docs are present (hash is row-local) — recompute on a half corpus
    val half = docs.filter(col("doc_id") % 2 === 0).select(col("doc_id"),
        TrainPrep.splitLabel(col("text")).as("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    half.foreach { case (id, s) => assert(a(id) == s) }
    // all three splits occur and train dominates on any real corpus
    val byLabel = a.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(byLabel.keySet == Set("train", "test", "val"))
    assert(byLabel("train") > byLabel("test") && byLabel("test") > byLabel("val"))
  }

  test("splitLabel rejects misordered cuts") {
    intercept[IllegalArgumentException] {
      TrainPrep.splitLabel(col("text"), valCut = "29", testCut = "0d")
    }
  }

  test("packBins: bins fill in order and overflow only at a boundary doc") {
    val toks = docs.select(col("doc_id"), (col("doc_id") % 4).as("sh"),
      size(split(col("text"), " ")).cast("long").as("n_tok"))
    val budget = 512L
    val packed = TrainPrep.packBins(toks, col("sh"), col("doc_id"),
      col("n_tok"), budget).collect()
    // reference packing computed sequentially per shard on the driver
    packed.groupBy(_.getLong(1)).foreach { case (_, rows) =>
      var cum = 0L
      rows.sortBy(_.getLong(0)).foreach { r =>
        assert(r.getLong(4) == cum / budget, s"doc ${r.getLong(0)}")
        cum += r.getLong(2)
      }
    }
    // bin ids are dense from 0 within each shard
    packed.groupBy(_.getLong(1)).foreach { case (sh, rows) =>
      val bins = rows.map(_.getLong(4)).distinct.sorted.toSeq
      assert(bins == (0L until bins.length.toLong).toSeq,
        s"shard $sh bins not dense: ${bins.mkString(",")}")
    }
  }

  test("stratifiedSample: deterministic, per-stratum rates, absent strata dropped") {
    val labeled = docs.select(col("doc_id"), col("text"), col("lang"))
    val fractions = Map("en" -> 0.5, "de" -> 1.0)
    def run() = graft.ops.TrainPrep.stratifiedSample(
        labeled, col("lang"), col("text"), fractions)
      .collect().map(_.getLong(0)).toSet
    val a = run()
    assert(a == run(), "sample must be identical across runs")
    // partitioning must not change the sample (content-hash decision)
    val b = graft.ops.TrainPrep.stratifiedSample(
        labeled.repartition(13), col("lang"), col("text"), fractions)
      .collect().map(_.getLong(0)).toSet
    assert(a == b)
    val langOf = labeled.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val total = langOf.groupBy(_._2).view.mapValues(_.size).toMap
    val kept = a.groupBy(langOf).view.mapValues(_.size).toMap
    // f=1.0 stratum keeps everything; unlisted strata keep nothing
    assert(kept.getOrElse("de", 0) == total.getOrElse("de", 0))
    assert(a.forall(id => fractions.contains(langOf(id))))
    // f=0.5 stratum keeps roughly half (hash-uniform; generous bounds)
    val en = kept.getOrElse("en", 0).toDouble / total("en")
    assert(en > 0.3 && en < 0.7, s"en keep rate $en")
  }

  test("decontaminate flags exactly the docs sharing enough distinct shingles") {
    import spark.implicits._
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"), // 4 shingles, all shared
      (2L, "one two three four five six seven"),   // disjoint from eval
      (3L, "alpha beta gamma nine ten"),           // 1 shared shingle
      (4L, "alpha beta gamma delta epsilon nope")  // 3 shared
    ).toDF("doc_id", "text")
    val eval_ = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta")).toDF("doc_id", "text")
    def run(min: Long) = graft.ops.TrainPrep.decontaminate(
        train, eval_, col("text"), col("doc_id"), shingleLen = 3, minOverlap = min)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run(4L) == Map(1L -> 4L))
    assert(run(3L) == Map(1L -> 4L, 4L -> 3L))
    assert(run(1L) == Map(1L -> 4L, 3L -> 1L, 4L -> 3L))
  }

  test("decontaminate dedups both sides below the join (distinct shingle sets)") {
    import spark.implicits._
    // repetition inside a doc must not inflate the overlap count
    val train = Seq((1L, "x y z x y z x y z")).toDF("doc_id", "text")
    val eval_ = Seq((9L, "x y z x y z")).toDF("doc_id", "text")
    val out = graft.ops.TrainPrep.decontaminate(
        train, eval_, col("text"), col("doc_id"), shingleLen = 3, minOverlap = 1L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // distinct shingles of "x y z x y z x y z": {x y z, y z x, z x y}
    assert(out == Map(1L -> 3L))
  }

  test("packBins window shuffles once on the shard key") {
    val toks = docs.select(col("doc_id"), (col("doc_id") % 4).as("sh"),
      size(split(col("text"), " ")).cast("long").as("n_tok"))
    val plan = TrainPrep.packBins(toks, col("sh"), col("doc_id"),
      col("n_tok"), 512L).queryExecution.executedPlan.toString
    assert(plan.contains("Window"), plan.take(2000))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected one shard exchange, got $exchanges:\n${plan.take(3000)}")
  }
}
