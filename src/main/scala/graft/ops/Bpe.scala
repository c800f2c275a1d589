package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary induction — the tokenizer-training
  * member of the corpus-statistics family (`q_bpe_pairs` declares the
  * single pair-count step; this op runs the full merge loop).
  *
  * Scale shape (the standard trick, structural here): everything
  * operates on the VOCABULARY — distinct words with frequencies, one
  * hash aggregate away from the corpus — never on raw text. Each
  * merge round is one pair-count aggregate over |vocab| rows plus a
  * row-local fold applying the merge; the collected state per round
  * is ONE (pair, count) row (the model lifecycle, like IVF centroids).
  * At 100 TB the corpus→vocab aggregate is the only corpus-sized job;
  * the loop's cost is |vocab| × rounds, independent of corpus size.
  *
  * Determinism: the winning pair each round is the max count with
  * lexicographic (a, b) tiebreak, and merge application is the
  * classic greedy left-to-right fold — both partition-independent, so
  * the learned merge table is reproducible on any cluster layout.
  */
object Bpe {

  /** Adjacent symbol pairs of an ARRAY<STRING> column, as structs
    * (a, b); empty for arrays under two symbols. Row-local. */
  def symbolPairs(syms: Column): Column =
    when(size(syms) >= 2,
      transform(sequence(lit(1), size(syms) - 1),
        i => struct(element_at(syms, i).as("a"),
          element_at(syms, i + lit(1)).as("b"))))
      .otherwise(array().cast("array<struct<a:string,b:string>>"))

  /** One greedy left-to-right application of merge (a, b) over a
    * symbol array: every adjacent (a, b) becomes the fused symbol
    * a+b, non-overlapping, scanning left to right (the reference BPE
    * behavior — "aaa" under (a,a) yields [aa, a]). Row-local HOF
    * fold; O(|syms|) per row. */
  def applyMerge(syms: Column, a: String, b: String): Column = {
    val fused = a + b
    aggregate(syms, array().cast("array<string>"), (acc, x) => {
      val last = element_at(acc, size(acc))
      when(size(acc) >= 1 && last === lit(a) && x === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(fused))))
        .otherwise(concat(acc, array(x)))
    })
  }

  /** Corpus → vocabulary: distinct words (≥2 chars contribute pairs,
    * but 1-char words are kept — they still matter for coverage
    * stats) with occurrence counts. The ONLY corpus-sized aggregate
    * in the whole induction. */
  def vocabulary(docs: DataFrame, textCol: Column): DataFrame =
    docs.select(explode(split(textCol, " ")).as("tok"))
      .filter(length(col("tok")) >= 1)
      .groupBy(col("tok")).agg(count(lit(1)).as("wc"))

  /** Learn `nMerges` BPE merges from a (tok, wc) vocabulary. Returns
    * the ordered merge table — the MODEL (apply with [[encode]]).
    * Stops early when no pair occurs at least `minCount` times.
    *
    * Each round: one pair-count aggregate (weighted by wc) over the
    * current symbolized vocab, ONE collected row (the argmax pair),
    * one row-local fold applying it; lineage is checkpoint-truncated
    * per round (see the loop comment). */
  def learn(vocab: DataFrame, nMerges: Int, minCount: Long = 2L):
      Seq[(String, String)] = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    // Like the connected-components loop (Dedup.duplicateGroups), each
    // round LOCALCHECKPOINTS the symbolized vocab: a cache() keeps the
    // full upstream lineage in the plan, and nested per-round caches
    // re-print that lineage inside every explain/AQE plan update —
    // observed to OOM the driver on plan STRINGS alone when the vocab
    // came out of a deep cleaning chain. The checkpoint truncates
    // lineage to the |vocab|-sized RDD; each round's blocks are freed
    // once the next round materializes.
    var cur = vocab.select(col("wc"), split(col("tok"), "").as("syms"))
      .localCheckpoint() // eager
    try {
      var continue = true
      while (continue && merges.length < nMerges) {
        val top = cur
          .select(col("wc"), explode(symbolPairs(col("syms"))).as("p"))
          .groupBy(col("p")).agg(sum(col("wc")).as("n"))
          .filter(col("n") >= minCount)
          .orderBy(col("n").desc, col("p.a"), col("p.b"))
          .limit(1)
          .collect()
        if (top.isEmpty) continue = false
        else {
          val p = top.head.getStruct(0)
          val (a, b) = (p.getString(0), p.getString(1))
          merges += ((a, b))
          val next = cur
            .withColumn("syms", applyMerge(col("syms"), a, b))
            .localCheckpoint() // eager: materialized before prev is freed
          Dedup.freeCheckpointBlocks(cur)
          cur = next
        }
      }
      merges.toSeq
    } finally Dedup.freeCheckpointBlocks(cur)
  }

  /** Tokenize `textCol` with a learned merge table: per word, start
    * from characters and apply the merges in learned order; output is
    * the flattened ARRAY<STRING> of subword tokens. Row-local; cost
    * O(words × merges × word length) — fine for the induction/eval
    * loop this op serves (a production encoder would compile the
    * table into a trie/priority-merge kernel; the MODEL is identical,
    * which is the part that must be distributed-exact). */
  def encode(textCol: Column, merges: Seq[(String, String)]): Column =
    flatten(transform(
      // empty words (leading/trailing/double spaces, empty text)
      // contribute no symbols — split of "" would yield one "" token
      filter(split(textCol, " "), w => length(w) >= 1), w => {
        val chars = split(w, "")
        merges.foldLeft(chars) { case (c, (a, b)) => applyMerge(c, a, b) }
      }))

  /** Convenience: induce a tokenizer straight from a corpus. */
  def learnFromCorpus(spark: SparkSession, docs: DataFrame,
      textCol: Column, nMerges: Int): Seq[(String, String)] =
    learn(vocabulary(docs, textCol), nMerges)

  /** Per-document BPE token counts, paying the merge fold once per
    * DISTINCT word instead of once per occurrence. [[encode]]'s HOF
    * chain is CodegenFallback — O(nMerges·|word|²) interpreted steps
    * with per-element array copies — so applying it to every token
    * occurrence of a corpus re-pays that cost |occurrences| times
    * (measured ~2.8 ms/doc at 16 merges in the r9 ×16 capstone). Here
    * the fold runs over the VOCABULARY frame (|distinct words| rows),
    * and the corpus side is an equi-join of the exploded words against
    * that (word → n_syms) dictionary plus one per-doc sum — linear,
    * no interpreted fold touches a corpus row.
    *
    * The dictionary is BROADCAST by default (r19, guide §3.1; the
    * same fix as the declared q_bpe_encode path): "left to the
    * planner", the planner size-estimates the exploded corpus side
    * through Generate — which barely inflates its input estimate —
    * as the SMALLER relation and broadcasts every word occurrence
    * while the aggregate-bounded dictionary streams. That is
    * backwards at every scale: occurrences ≥ distinct words by
    * construction (the dict is the distinct of the same explode) and
    * grow linearly where the vocabulary grows sub-linearly (Heaps'
    * law), so the un-hinted shape is a driver OOM / broadcast-cap
    * breach on exactly the corpora this operator exists for. Pass
    * `broadcastDict = false` for the degenerate case of a vocabulary
    * too large for the 8 GB broadcast cap (the planner then picks a
    * shuffled join on the word key) — same opt-out pattern as
    * Indicators' `rangeExchange`.
    *
    * Output: (id, n_tok); documents whose text contains no non-empty
    * word (empty string) get no row — filter or coalesce upstream if
    * zero-token docs must appear. Exactly equal to
    * `size(encode(text, merges))` per doc (BpeSpec parity gate). */
  def tokenCounts(docs: DataFrame, textCol: Column, idCol: Column,
      merges: Seq[(String, String)], broadcastDict: Boolean = true): DataFrame = {
    val dict = vocabulary(docs, textCol)
      .select(col("tok"), size(encode(col("tok"), merges)).cast("long").as("__n_syms"))
    docs.select(idCol.as("id"),
        explode(filter(split(textCol, " "), w => length(w) >= 1)).as("tok"))
      .join(if (broadcastDict) broadcast(dict) else dict, "tok")
      .groupBy(col("id")).agg(sum(col("__n_syms")).as("n_tok"))
  }
}
