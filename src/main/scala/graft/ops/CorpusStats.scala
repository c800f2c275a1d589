package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level statistics for LLM training-data curation: token
  * term/document frequencies (the classic language-model counting
  * job), TF-IDF term weighting, Gopher-style repetition metrics
  * (duplicate-token fraction, top-bigram coverage), and per-document
  * token-distribution entropy.
  *
  * Replicates the aggregate/reporting semantics of the reference's
  * analytics layer (tiisnel/stock_data_project streamlit/app.py:69-101
  * computes grouped aggregates + ratios over the fact table; here the
  * same grouped-aggregate shapes run over token streams) extended to
  * the corpus-statistics operators a pre-training pipeline needs.
  *
  * Determinism devices (SURVEY §7.3):
  *  - every float reduction that crosses a partition boundary is
  *    carried as an exact integer sum — `ln` terms are converted to
  *    fixed-point BIGINTs per row (`round(ln(x)*1e6)`), summed
  *    exactly, and divided back to double once at the end. Partition
  *    order can never change the result, on 32 local threads or 1000
  *    executors.
  *  - ratios of exact integer counts are single IEEE divisions —
  *    bit-identical across engines.
  *
  * Scale notes (the 100 TB shapes):
  *  - `tokenFrequencies` is two partial+final hash aggregates — the
  *    (token, doc) dedup combine runs map-side, so the exchange
  *    carries distinct pairs, not token occurrences.
  *  - `tfIdf` joins the token stream against the vocabulary-sized df
  *    table on the token key — Spark broadcasts it while it fits and
  *    falls back to a shuffle join when the vocabulary outgrows the
  *    threshold; no driver-side collection either way.
  *  - repetition metrics and entropy terms are row-local expressions
  *    below one final aggregate; nothing shuffles full texts.
  */
object CorpusStats {

  /** Fixed-point natural log: round(ln(x) * 1e6) as BIGINT. Exact
    * integer afterwards — summable in any order. 1e6 keeps c*ln(c)
    * products for per-doc counts well inside BIGINT range.
    *
    * Cross-ENGINE caveat: partition-order independence is guaranteed
    * (the sum is over integers), but bit-parity with another engine's
    * ln() additionally assumes both libms agree to the ulp at the
    * .5-micro-nat rounding boundaries. Java's StrictMath-backed
    * Math.log and DuckDB's libm have agreed on every tested input;
    * a platform where they differ would flip single units — compare
    * *_fp columns with a ±1 tolerance there instead of exact hash. */
  private def lnFp(x: Column): Column =
    round(log(x.cast("double")) * lit(1000000L)).cast("long")

  /** One row per token occurrence: (idCol, tok). The explode runs
    * where the scan runs — repartition upstream if the source layout
    * is a single split (see ExtendedQueries.shingles note). */
  def tokens(df: DataFrame, text: Column, id: Column): DataFrame =
    df.select(id.as("id"), explode(split(text, " ")).as("tok"))

  /** Per-(doc, token) occurrence counts — the shared intermediate of
    * every corpus statistic below (term/doc frequency, TF-IDF,
    * entropy). One map-side-combinable hash aggregate; the exchange
    * carries distinct (id, tok) pairs, never raw occurrences. Callers
    * running several statistics over one corpus should compute (and
    * cache) this once. */
  def docTokenCounts(toks: DataFrame): DataFrame =
    toks.groupBy(col("id"), col("tok")).agg(count(lit(1)).as("c"))

  /** Corpus term frequency + document frequency per token, from the
    * shared (id, tok, c) counts: tf = Σc, df = #docs. A single
    * `count(distinct id)` formulation would expand to the same
    * two-phase plan; the explicit intermediate is reusable. */
  def tokenFrequenciesFromCounts(counts: DataFrame): DataFrame =
    counts.groupBy(col("tok"))
      .agg(sum(col("c")).as("tf"), count(lit(1)).as("df"))

  def tokenFrequencies(toks: DataFrame): DataFrame =
    tokenFrequenciesFromCounts(docTokenCounts(toks))

  /** Per-(doc, token) TF-IDF with a FIXED-POINT idf: the idf weight
    * `ln((N+1)/(df+1))` is rounded to an integer micro-nat
    * (`round(ln(..)*1e6)`), so every downstream score
    * (`tf * idf_fp`) is an exact BIGINT — rankings and hash-compares
    * are deterministic across engines and partitionings, with ties
    * broken lexicographically by token.
    *
    * `nDocs` is passed by the caller (a prior cheap count or a known
    * corpus size) rather than computed here, keeping the operator a
    * pure plan transform. */
  def tfIdf(toks: DataFrame, nDocs: Long): DataFrame =
    tfIdfFromCounts(docTokenCounts(toks), nDocs)

  /** TF-IDF from the shared (id, tok, c) counts frame: df is one more
    * aggregate over the counts (#docs per token), joined back on the
    * token key. */
  def tfIdfFromCounts(counts: DataFrame, nDocs: Long): DataFrame = {
    val df = counts.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .withColumn("idf_fp", lnFp((lit(nDocs) + lit(1)).cast("double") / (col("df") + lit(1))))
    counts.withColumnRenamed("c", "tf").join(df, "tok")
      .select(col("id"), col("tok"), col("tf"),
        (col("tf") * col("idf_fp")).as("score_fp"))
  }

  /** Top-k TF-IDF terms per document (rank by exact integer score
    * desc, token asc — fully deterministic). One window shuffle on the
    * doc key. */
  def tfIdfTop(toks: DataFrame, nDocs: Long, k: Int): DataFrame =
    tfIdfTopFromCounts(docTokenCounts(toks), nDocs, k)

  def tfIdfTopFromCounts(counts: DataFrame, nDocs: Long, k: Int): DataFrame =
    tfIdfTopFromScores(tfIdfFromCounts(counts, nDocs), k)

  /** The top-k rank step alone, over a prebuilt (id, tok, tf,
    * score_fp) score table — callers that persist the scored frame
    * (train-once/rank-often) pay only this window per pass. */
  def tfIdfTopFromScores(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("id"))
      .orderBy(col("score_fp").desc, col("tok"))
    scored
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
  }

  /** Per-document token totals from the shared (id, tok, c) counts —
    * the BM25 length-normalization side. */
  def docLengths(counts: DataFrame): DataFrame =
    counts.groupBy(col("id")).agg(sum(col("c")).as("len"))

  /** BM25 retrieval over the shared (id, tok, c) counts: rank
    * documents for a bag-of-words query. Okapi BM25 with the robust
    * idf `ln(1 + (N − df + 0.5)/(df + 0.5))`; k1/b are the standard
    * defaults.
    *
    * Scale shape: the query-term filter is a literal IN pushed to the
    * counts scan, so the per-term postings (the only rows that ever
    * shuffle) are |query terms| × df rows — never the corpus; df for
    * the query terms is one aggregate over those postings; the
    * doc-length side joins on the doc id (precompute and persist
    * [[docLengths]] for the rank-often lifecycle); the final top-k is
    * order+limit → TakeOrderedAndProject, never a total sort.
    * `nDocs`/`avgLen` are caller-passed corpus constants (one cheap
    * prior aggregate), keeping the operator a pure plan transform.
    * Ties break by doc id ascending for a deterministic ranking. */
  def bm25Search(counts: DataFrame, docLens: DataFrame, nDocs: Long,
      avgLen: Double, queryTerms: Seq[String], k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25Contrib(counts, docLens, nDocs, avgLen, queryTerms, k1, b)
      .groupBy(col("id"))
      .agg(sum(col("__contrib")).as("score"),
        count(lit(1)).as("n_terms_matched"))
      .orderBy(col("score").desc, col("id")).limit(k)

  /** [[bm25Search]] with the per-doc reduction carried as exact
    * fixed-point micro-units: each (doc, term) contribution — a pure
    * row-local chain of IEEE double ops, bit-identical on any engine
    * given the same inputs and association order — is rounded to
    * `round(contrib · 1e6)` BIGINT and the per-doc score is the exact
    * integer sum (§7.3 discipline: cross-partition float sums are
    * order-dependent; integer sums are not). Output: (id, score_fp,
    * n_terms_matched), ranked by `score_fp` desc with id tiebreak —
    * the hash-gated declared form (`q_bm25`); [[bm25Search]] keeps the
    * exact-double score for serving-tier use. Same plan shape:
    * IN-pushed postings, term-df aggregate, doc-length join, top-k via
    * TakeOrderedAndProject. */
  def bm25SearchFp(counts: DataFrame, docLens: DataFrame, nDocs: Long,
      avgLen: Double, queryTerms: Seq[String], k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25Contrib(counts, docLens, nDocs, avgLen, queryTerms, k1, b)
      .withColumn("__fp", round(col("__contrib") * lit(1e6)).cast("long"))
      .groupBy(col("id"))
      .agg(sum(col("__fp")).as("score_fp"),
        count(lit(1)).as("n_terms_matched"))
      .orderBy(col("score_fp").desc, col("id")).limit(k)

  /** Shared BM25 scoring plan: per-(doc, matched-term) `__contrib`.
    * The double expression's association order is part of the oracle
    * contract — `q_bm25`'s SQL mirrors it operation for operation. */
  private def bm25Contrib(counts: DataFrame, docLens: DataFrame,
      nDocs: Long, avgLen: Double, queryTerms: Seq[String],
      k1: Double, b: Double): DataFrame = {
    require(queryTerms.nonEmpty, "bm25Search requires at least one query term")
    require(avgLen > 0.0, s"avgLen must be positive, got $avgLen")
    val postings = counts.filter(col("tok").isin(queryTerms.distinct: _*))
    val dfPerTerm = postings.groupBy(col("tok"))
      .agg(count(lit(1)).as("df"))
      .withColumn("idf", log(lit(1.0) +
        (lit(nDocs.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
    postings
      .join(dfPerTerm, "tok")
      .join(docLens, "id")
      .withColumn("__contrib", col("idf") *
        (col("c") * lit(k1 + 1.0)) /
        (col("c") + lit(k1) * (lit(1.0 - b) + lit(b) * col("len") / lit(avgLen))))
  }

  /** Row-local duplicate-token stats: token count, distinct count,
    * duplicate fraction (1 - distinct/total — the Gopher-style
    * repetition signal). Pure expressions; no shuffle. */
  def repetitionStats(text: Column): (Column, Column, Column) = {
    // one TokenStats kernel pass instead of two independent splits
    // (size + array_distinct); both fields read the same CSE'd struct
    val st = graft.functions.GraftFunctions.tokenStats(text)
    val nTok = st.getField("n_tokens")
    val nDis = st.getField("n_distinct")
    val dupFrac = round(lit(1.0) - nDis.cast("double") / nTok.cast("double"), 4)
    (nTok, nDis, dupFrac)
  }

  /** Adjacent word bigrams of a whitespace-tokenized text (empty for
    * texts under two tokens — guarded: `sequence(1, 0)` would count
    * DOWN in Spark, and `element_at(w, 0)` is an ANSI error).
    * Row-local. */
  def bigrams(text: Column): Column =
    // the ShingleWindows kernel at n=2: the old HOF transform
    // referenced the split(text) subtree per element_at INSIDE its
    // lambda (no CSE for lambda subtrees), re-splitting the document
    // twice per bigram — the same hazard Dedup.shingleArray carried.
    // coalesce keeps the under-2-token contract (empty array, not
    // null) and types the column non-nullable.
    coalesce(
      graft.functions.GraftFunctions.shingleWindows(split(text, " "), 2),
      array().cast("array<string>"))

  /** Most frequent bigram per document and the fraction of bigram
    * slots it covers (the Gopher top-2-gram repetition rule). Ties
    * break lexicographically.
    *
    * Shape: explode + THREE hash aggregates (per-(doc,bigram) counts,
    * partial+final argmax per doc) — no sort window. The argmax is
    * `min(struct(-c, bg))`: struct ordering compares fields left to
    * right, so the minimum is (max count, lexicographically smallest
    * bigram among ties) — identical semantics to a
    * `row_number() over (order by c desc, bg)` rank-1 filter, but the
    * second exchange carries ONE partially-reduced struct per doc
    * instead of every distinct (doc, bigram, count) row, and a hash
    * aggregate replaces the window's full sort. At 100 TB that is the
    * difference between shuffling the vocabulary and shuffling the
    * document count. */
  def topBigram(df: DataFrame, text: Column, id: Column): DataFrame = {
    val bg = df.select(id.as("id"), (size(split(text, " ")) - lit(1)).cast("long").as("n_bg"),
        explode(bigrams(text)).as("bg"))
    bg.groupBy(col("id"), col("n_bg"), col("bg"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("id"), col("n_bg"))
      .agg(min(struct((-col("c")).as("nc"), col("bg").as("bg"))).as("top"))
      .select(col("id"), col("top.bg").as("bg"), (-col("top.nc")).as("c"),
        round((-col("top.nc")).cast("double") / col("n_bg").cast("double"), 4).as("frac"))
  }

  /** [[topBigram]] over precomputed (id, bg, c) counts
    * ([[docBigramCounts]] — the cache the bigram-LM scorer shares):
    * the slot total n_bg = Σ c per doc, identical to tokens−1, so the
    * whole operator collapses to ONE hash aggregate over the count
    * table — no per-run explode, no second exchange. */
  def topBigramFromCounts(docBg: DataFrame): DataFrame =
    docBg.groupBy(col("id"))
      .agg(sum(col("c")).as("n_bg"),
        min(struct((-col("c")).as("nc"), col("bg").as("bg"))).as("top"))
      .select(col("id"), col("top.bg").as("bg"), (-col("top.nc")).as("c"),
        round((-col("top.nc")).cast("double") / col("n_bg").cast("double"), 4).as("frac"))

  /** Approximate top tokens of a corpus via the Misra-Gries sketch
    * (`graft.functions.FreqItemsAgg`): one pass, O(capacity) state per
    * partial, O(capacity) bytes exchanged — the scale path when the
    * vocabulary is too large to count exactly (`tokenFrequencies`) but
    * only the head of the distribution matters. Returns (item, est)
    * rows, est desc; counts may undercount by ≤ n/(capacity+1) and are
    * exact when the vocabulary fits in `capacity`. */
  def heavyHitterTokens(toks: DataFrame, capacity: Int = 256): DataFrame =
    toks.agg(graft.functions.FreqItemsAgg.freqItems(col("tok"), capacity).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item").as("item"), col("e.est").as("est"))

  /** Per-document Shannon entropy (nats) of the token distribution,
    * computed ENTIRELY in exact integer arithmetic until one final
    * division:
    *
    *   H = ln(n) - (1/n) * Σ c·ln(c)
    *     ≈ (round(ln(n)·1e6)·n - Σ c·round(ln(c)·1e6)) / (n·1e6)
    *
    * The Σ runs over per-token counts c as a BIGINT sum of exact
    * products — map-side combinable, partition-order independent (a
    * double Σ c·ln(c) would drift with aggregation order at 1000
    * executors). Error from the fixed-point ln is ≤ n·0.5e-6/n·1e0 =
    * 5e-7 nats — invisible at the 4 dp the callers round to.
    *
    * Input: the (id, tok) occurrence stream. Two hash aggregates, one
    * shuffle on (id, tok) then a reuse-partitioned one on (id). */
  def tokenEntropy(toks: DataFrame): DataFrame =
    tokenEntropyFromCounts(docTokenCounts(toks))

  /** Entropy from the shared (id, tok, c) counts frame. */
  def tokenEntropyFromCounts(counts: DataFrame): DataFrame =
    counts.groupBy(col("id"))
      .agg(sum(col("c")).as("n"), sum(col("c") * lnFp(col("c"))).as("s_fp"))
      .select(col("id"), col("n"),
        round((lnFp(col("n")) * col("n") - col("s_fp")).cast("double") /
          (col("n").cast("double") * lit(1e6)), 4).as("entropy"))

  /** Per-(doc, bigram) occurrence counts — the shared intermediate of
    * the bigram statistics (top-bigram uses its own guarded transform;
    * this one feeds the LM scorer). One map-side-combinable hash
    * aggregate; the exchange carries distinct (id, bigram) pairs. */
  def docBigramCounts(df: DataFrame, text: Column, id: Column): DataFrame =
    df.select(id.as("id"), explode(bigrams(text)).as("bg"))
      .groupBy(col("id"), col("bg")).agg(count(lit(1)).as("c"))

  /** Per-document score under the corpus's own MLE bigram language
    * model — the classic in-domain fluency / quality signal (docs that
    * score far below the corpus average are repetitive garbage or
    * out-of-distribution):
    *
    *   score = Σ_occurrences ln P(w2 | w1)
    *         = Σ cnt(doc, w1w2) · (ln c(w1w2) − ln c(w1·))
    *
    * where c(w1·) = Σ_w2 c(w1,w2) — first-word context totals, so each
    * conditional sums to 1 exactly. Both ln terms are per-row
    * fixed-point micro-nat BIGINTs ([[lnFp]]) and the per-doc sum is
    * exact integer arithmetic — partition-order independent at 1000
    * executors; one double division at the end (avg nats/bigram).
    *
    * Plan shape: the model tables derive from the SAME (id, bg, c)
    * counts being scored (one partial+final agg each — no second
    * corpus scan); the score join is bigram-vocabulary-sized on one
    * side and candidate on the other — Catalyst picks broadcast while
    * the vocab fits, shuffle join beyond, and either way the exchange
    * carries distinct (doc, bigram) pairs, never raw occurrences.
    * Scores are always ≤ 0; avg_nats is the length-normalized form. */
  def bigramLmFromCounts(docBg: DataFrame): DataFrame =
    bigramLmScoreWithModel(docBg, bigramLmModel(docBg))

  /** The LM itself as a table: per-bigram fixed-point conditional
    * log-prob `w_fp = round(ln c(w1w2)·1e6) − round(ln c(w1·)·1e6)`.
    * Bigram-vocabulary sized. Materialize (cache) it when many
    * scoring passes reuse one model — the train-once/score-often
    * shape; the w1 totals join is vocab×vocab, paid once inside the
    * model build instead of per scoring pass. */
  def bigramLmModel(docBg: DataFrame): DataFrame = {
    val corpus = docBg.groupBy(col("bg")).agg(sum(col("c")).as("c_bg"))
    val ctx = corpus
      .select(substring_index(col("bg"), " ", 1).as("w1"), col("c_bg"))
      .groupBy(col("w1")).agg(sum(col("c_bg")).as("c_w1"))
    corpus
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .join(ctx, "w1")
      .select(col("bg"), (lnFp(col("c_bg")) - lnFp(col("c_w1"))).as("w_fp"))
  }

  /** Score documents against a prebuilt [[bigramLmModel]]: one
    * equi-join on the bigram key + one per-doc aggregate. When both
    * inputs are persisted partitioned on `bg` (the cache discipline
    * the declared query uses), the join is exchange-free and the only
    * shuffle is the per-doc partial-aggregate merge (|docs|·partials,
    * not |bigram occurrences|).
    *
    * Out-of-vocabulary bigrams — the POINT of train-once/score-often
    * is scoring docs the model never saw — take a LEFT join and score
    * at the hard floor `ln P = −oovNats` (default 20 ≈ P = 2·10⁻⁹).
    * An inner join here would silently DROP unseen bigrams: each
    * would contribute ln P = 0 (maximal fluency), inflating exactly
    * the out-of-distribution docs a perplexity filter exists to
    * catch, and a fully-unseen doc would vanish from the output. */
  def bigramLmScoreWithModel(docBg: DataFrame, model: DataFrame,
      oovNats: Double = 20.0): DataFrame = {
    require(oovNats > 0, s"oovNats must be positive, got $oovNats")
    val oovFp = -math.round(oovNats * 1e6)
    docBg
      .join(model, Seq("bg"), "left")
      .withColumn("__w_fp", coalesce(col("w_fp"), lit(oovFp)))
      .groupBy(col("id"))
      .agg(sum(col("c")).as("n_bg"),
        sum(col("c") * col("__w_fp")).as("score_fp"))
      .select(col("id"), col("n_bg"), col("score_fp"),
        round(col("score_fp").cast("double") /
          (col("n_bg").cast("double") * lit(1e6)), 4).as("avg_nats"))
  }

  def bigramLmScore(df: DataFrame, text: Column, id: Column): DataFrame =
    bigramLmFromCounts(docBigramCounts(df, text, id))

  /** Exact phrase search over positional postings — the inverted-
    * index read shape, not a substring scan: tokens explode WITH
    * position, the frame is immediately filtered to the phrase's own
    * terms (at 100 TB, against a persisted postings table, that
    * filter is the index fetch — |phrase terms' postings| rows read,
    * never the corpus; here the filter runs in the scan stage of the
    * one tokenize pass), and each term anchors to its candidate
    * phrase START (`pos − offset`). An n-term phrase is then an
    * (id, start) equi-join chain — a start survives iff ALL n terms
    * sit at their offsets — and the per-doc count is a map-side-
    * combined aggregate. Overlapping occurrences each count (every
    * valid start is its own row); a repeated term in the phrase is
    * handled by construction (each anchored frame carries one row
    * per POSITION, so self-overlap cannot double-join). Returns
    * (id, n_occ), only docs with ≥ 1 occurrence. */
  def phraseOccurrences(df: DataFrame, text: Column, id: Column,
      phrase: Seq[String]): DataFrame = {
    require(phrase.size >= 2, s"phrase needs >= 2 terms, got $phrase")
    val toks = df.select(id.as("id"),
        posexplode(split(text, " ")).as(Seq("pos", "tok")))
      .filter(col("tok").isin(phrase.distinct: _*))
    val anchored = phrase.zipWithIndex.map { case (w, i) =>
      toks.filter(col("tok") === w)
        .select(col("id"), (col("pos") - i).as("start"))
    }
    anchored.reduce((a, b) => a.join(b, Seq("id", "start")))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_occ"))
  }
}
