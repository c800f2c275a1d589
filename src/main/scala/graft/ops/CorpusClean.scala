package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end corpus cleaning — the composition a large-scale
  * training-data preparation run executes, built entirely from the
  * library's own operators so every stage keeps its at-scale plan
  * shape (codegen'd column filters, hash-partitioned dedup,
  * keys-only LSH shuffles, candidate-bounded verify):
  *
  *   1. language filter   (TextAnalysis.langId — codegen'd columns)
  *   2. quality filter    (TextAnalysis.qualityOk)
  *   3. exact dedup       (Dedup.dedupExact — keep lowest id per hash)
  *   4. near-dup dedup    (MinHash+LSH candidates → exact Jaccard
  *                         verify ≥ threshold → greedy keep-lowest-id)
  *
  * Near-dup elimination uses the standard greedy rule: a document is
  * dropped when it is the HIGHER id of any verified pair. This keeps
  * exactly the canonical (lowest-id) member of every pairwise-linked
  * group reachable in one hop; unlike full connected components it
  * needs no iteration, and with a verify threshold high enough to
  * imply transitivity in practice it is the common production choice
  * (a CC pass can replace stage 4 without touching stages 1-3).
  *
  * Every stage is lazy; `clean` returns the cleaned corpus plus a
  * per-stage survivor-count frame (computed from the same lazy plans —
  * callers pay for counts only if they evaluate them).
  */
object CorpusClean {

  /** Tuning knobs with the library's defaults. */
  case class Config(
      lang: String = "en",
      stopwords: Seq[String] = Seq("a", "the"),
      langThreshold: Double = 0.05,
      minTokens: Int = 30,
      minTtr: Double = 0.3,
      numHashes: Int = 8,
      bands: Int = 2,
      shingleLen: Int = 3,
      jaccardThreshold: Double = 0.8)

  /** Result: cleaned docs (original schema) + per-stage counts
    * (stage, docs_in, docs_out). `stageStats` is a thunk: the counting
    * jobs (one count per stage) run only when invoked — callers that
    * only want the cleaned corpus never pay for them. */
  case class Cleaned(docs: DataFrame, stageStats: () => DataFrame)

  def clean(docs: DataFrame, textCol: Column, idCol: Column,
      cfg: Config = Config()): Cleaned = {
    val langKept = docs.filter(
      TextAnalysis.langId(textCol, cfg.stopwords, cfg.lang, cfg.langThreshold) === cfg.lang)
    val qualityKept = langKept.filter(
      TextAnalysis.qualityOk(textCol, cfg.minTokens, cfg.minTtr))
    val exactKept = Dedup.dedupExact(qualityKept, textCol, idCol)

    // near-dup: LSH candidates over the exact-deduped survivors, then
    // exact Jaccard verify restricted to those candidates
    val cands = Dedup.minHashLshCandidates(exactKept, textCol, idCol,
      cfg.numHashes, cfg.bands, cfg.shingleLen, cacheBands = false)
    val verified = Dedup.ngramJaccardPairs(exactKept, textCol, idCol,
        cfg.shingleLen, candidates = Some(cands))
      .filter(col("jac") >= cfg.jaccardThreshold)
    // drop the higher id of each verified pair (broadcast: the drop
    // list is bounded by |verified pairs| — LSH-bounded by construction)
    val dropIds = verified.select(col("id2").as("__drop_id")).distinct()
    val nearKept = exactKept.join(broadcast(dropIds),
      idCol === col("__drop_id"), "left_anti")

    Cleaned(nearKept,
      () => stageCounts(docs, langKept, qualityKept, exactKept, nearKept))
  }

  /** Per-stage survivor counts. Separate so callers that only want the
    * cleaned corpus never pay for the counting jobs. */
  private def stageCounts(raw: DataFrame, lang: DataFrame, quality: DataFrame,
      exact: DataFrame, near: DataFrame): DataFrame = {
    val spark = raw.sparkSession
    import spark.implicits._
    val total = raw.count()
    val nLang = lang.count()
    val nQual = quality.count()
    val nExact = exact.count()
    val nNear = near.count()
    Seq(
      ("language", total, nLang),
      ("quality", nLang, nQual),
      ("exact_dedup", nQual, nExact),
      ("near_dedup", nExact, nNear))
      .toDF("stage", "docs_in", "docs_out")
  }
}
