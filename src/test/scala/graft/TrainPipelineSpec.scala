package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Bpe, CorpusClean, TrainPrep}

/** Capstone integration: the full training-data path composed end to
  * end over the driver testdata — clean (lang → quality → exact dedup
  * → LSH near-dedup → decontaminate → boilerplate scrub) → BPE
  * tokenize → content-hash split → sharded sequence packing — with
  * row and token accounting asserted at every boundary. Each stage is
  * spec'd in isolation elsewhere; this pins that they COMPOSE: column
  * contracts line up, nothing double-drops or resurrects rows, and
  * the packed output covers exactly the cleaned training split. */
class TrainPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("clean -> tokenize -> split -> pack composes with exact accounting") {
    val docs = queries.t(spark, TestSpark.sfTiny, "documents")
    val total = docs.count()

    // a tenth of the corpus doubles as the eval set — their exact
    // twins in train must fall to decontamination
    // same column names as the corpus: clean() rebinds textCol/idCol
    // by name against the eval frame
    val eval = docs.filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"), col("text"))

    val cleaned = CorpusClean.clean(docs, col("text"), col("doc_id"),
      CorpusClean.Config(minTokens = 5, decontamMinOverlap = 3L,
        scrubBoilerplate = true),
      evalCorpus = Some(eval))
    try {
      // stage accounting: monotone survivor counts, first stage fed
      // by the full corpus, last stage's output = the result frame
      val stages = cleaned.stageStats().collect()
      assert(stages.nonEmpty)
      assert(stages.head.getAs[Long]("docs_in") == total)
      stages.foreach { r =>
        assert(r.getAs[Long]("docs_out") <= r.getAs[Long]("docs_in"),
          s"stage ${r.getString(0)} grew the corpus")
      }
      // stage boundary: localCheckpoint truncates the cleaning
      // chain's lineage (a production pipeline writes/reads parquet
      // here) — downstream plans must not re-print the whole clean
      // plan per AQE update
      val kept = cleaned.docs.localCheckpoint()
      val nKept = kept.count()
      assert(nKept == stages.last.getAs[Long]("docs_out"))
      assert(nKept > 0 && nKept < total, s"kept $nKept of $total")
      // eval twins are gone from the survivors — assert on doc_id,
      // not text: the scrub stage rewrites text afterwards, so a text
      // join could false-pass on a scrub-modified escaped twin
      assert(kept.filter(col("doc_id") % 10 === 0).count() == 0,
        "decontamination must drop exact eval twins")

      // tokenizer induced on the CLEANED corpus (scrub rewrote `text`
      // in place — schema unchanged); every survivor tokenizes to >0
      // tokens (quality gate guarantees >= 5 words)
      val merges = Bpe.learnFromCorpus(spark, kept, col("text"), nMerges = 6)
      assert(merges.nonEmpty)
      val toks = kept.select(col("doc_id"),
        size(Bpe.encode(col("text"), merges)).cast("long").as("n_tok"))
      assert(toks.filter(col("n_tok") <= 0).count() == 0)

      // deterministic content split: rows AND tokens total across
      // splits (disjoint by construction)
      val totalToks = toks.agg(sum(col("n_tok"))).head.getLong(0)
      val labeled = toks.withColumn("split",
        TrainPrep.splitLabel(col("doc_id"), valCut = "1", testCut = "3"))
      val bySplit = labeled.groupBy(col("split")).agg(
          sum(col("n_tok")).as("t"), count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(bySplit.values.map(_._2).sum == nKept, s"split lost rows: $bySplit")
      assert(bySplit.values.map(_._1).sum == totalToks,
        s"split lost tokens: $bySplit vs $totalToks")

      // pack the train split into 4 shards at a 64-token budget;
      // verify bin assignment against a scalar reference fold
      val train = labeled.filter(col("split") === "train")
      val packed = TrainPrep.packBins(train,
        shardCol = pmod(col("doc_id"), lit(4)), orderCol = col("doc_id"),
        tokCol = col("n_tok"), budget = 64L)
      assert(packed.count() == train.count(), "packing must not drop rows")
      val rows = packed.select(col("shard").cast("long"), col("doc_id"),
          col("n_tok"), col("bin"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      rows.groupBy(_._1).foreach { case (shard, rs) =>
        var cum = 0L
        rs.sortBy(_._2).foreach { case (_, id, n, bin) =>
          assert(bin == cum / 64L, s"shard $shard doc $id: bin $bin != ${cum / 64}")
          cum += n
        }
      }
      // bins start at 0 and never decrease along the pack order (they
      // MAY skip ids — a document larger than the budget advances the
      // cumulative count past whole bins; that is the documented
      // first-token assignment rule, not a gap bug)
      rows.groupBy(_._1).foreach { case (shard, rs) =>
        val bins = rs.sortBy(_._2).map(_._4)
        assert(bins.head == 0L && bins.sliding(2).forall(w =>
          w.length < 2 || w(0) <= w(1)), s"shard $shard bins not monotone")
      }
      graft.ops.Dedup.freeCheckpointBlocks(kept)
    } finally cleaned.release()
  }
}
