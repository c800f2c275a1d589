package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.CorpusStats

/** Declared corpus-statistics queries (SURVEY §2.11 extension): the
  * counting/weighting/repetition jobs a pre-training data pipeline
  * runs over the whole corpus, backed by `graft.ops.CorpusStats`.
  *
  * Determinism: every cross-partition float reduction is carried as an
  * exact fixed-point BIGINT (`round(ln(x)*1e6)` per row, integer sums)
  * and divided back to double exactly once; rankings order by exact
  * integers with lexicographic tiebreaks. See CorpusStats scaladoc.
  */
object CorpusStatsQueries {

  /** Shared memoized per-(doc, token) count frame: q_token_df,
    * q_tfidf_top and q_doc_entropy are all one aggregate away from it.
    * Cached via the same session-scoped memo as the shingle/band/norm
    * frames (released together by `ExtendedQueries.releaseCaches`).
    * Repartitioned first — the testdata parquet is a single split
    * (see ExtendedQueries.shingles note). */
  private[queries] def docTokenCounts(s: org.apache.spark.sql.SparkSession, d: String) =
    ExtendedQueries.memoCache("toktf", s, d) {
      CorpusStats.docTokenCounts(
        CorpusStats.tokens(
          ExtendedQueries.docProfile(s, d), col("text"), col("doc_id")))
    }

  /** Shared memoized per-(doc, bigram) count frame — the explode is
    * the dominant cost, paid once; the bigram-LM scorer AND the
    * top-bigram query both read it. Partitioned on the bigram key so
    * the LM score join is exchange-free. */
  private[queries] def docBigramCounts(s: org.apache.spark.sql.SparkSession, d: String) =
    ExtendedQueries.memoCache("bgcounts", s, d) {
      CorpusStats.docBigramCounts(
          ExtendedQueries.docProfile(s, d), col("text"), col("doc_id"))
        .repartition(s.sparkContext.defaultParallelism, col("bg"))
    }

  /** Fixed merge table for q_bpe_encode — literal in both engines,
    * applied in order, each merge one full greedy pass per word. The
    * (t,h) → (th,e) prefix exercises cascading (learned-order
    * dependence), the rest hit the corpus's common bigrams. */
  private[queries] val bpeOracleMerges: Seq[(String, String)] = Seq(
    ("t", "h"), ("th", "e"), ("e", "r"), ("a", "t"),
    ("o", "r"), ("or", "t"), ("a", "n"), ("s", "c"))

  val queries: Map[String, QFn] = Map(
    // Corpus token term/document frequency — the LM counting job.
    // Two partial+final hash aggregates; the exchange carries distinct
    // (tok, doc) pairs, never raw occurrences. Top 40 by (tf, tok).
    "q_token_df" -> { (s, d) =>
      CorpusStats.tokenFrequenciesFromCounts(docTokenCounts(s, d))
        .orderBy(col("tf").desc, col("tok"))
        .limit(40)
    },

    // Top-3 TF-IDF terms per document. Fixed-point idf (micro-nats as
    // BIGINT) makes scores exact integers: ranking and hash-compare
    // are deterministic on any engine/partitioning. The df side is
    // vocabulary-sized — broadcast while it fits, shuffle join beyond.
    "q_tfidf_top" -> { (s, d) =>
      // corpus size memoized beside the toktf cache: a driver-side
      // count() per invocation was a whole extra Spark job (full scan)
      // before the real plan even started. The scored (id, tok, tf,
      // score_fp) table is memoized too — the df aggregate + idf join
      // run once per session; a ranking pass pays only its window.
      val nDocs = ExtendedQueries.memoCount("ndocs", s, d) {
        t(s, d, "documents").count()
      }
      val scored = ExtendedQueries.memoCache("tfidfscore", s, d) {
        CorpusStats.tfIdfFromCounts(docTokenCounts(s, d), nDocs)
      }
      CorpusStats.tfIdfTopFromScores(scored, 3)
        .select(col("id").as("doc_id"), col("tok"), col("tf"),
          col("score_fp"), col("rk").cast("long").as("rk"))
        .orderBy(col("doc_id"), col("rk"))
    },

    // Misra-Gries heavy hitters as a DECLARED query: top-20 corpus
    // tokens from the mergeable O(capacity) sketch
    // (graft.functions.FreqItemsAgg). With capacity (64) ≥ the
    // corpus's distinct-token count, no decrement ever fires and every
    // estimate is EXACT under any partitioning/merge order — which is
    // what lets the oracle be the plain exact count. At a 100 TB
    // vocabulary the same plan degrades gracefully to the documented
    // undercount bounds instead of an OOM-ing exact shuffle; the
    // exactness precondition is the declared test-scale contract.
    "q_heavy_hitters" -> { (s, d) =>
      val sketch = CorpusStats.tokens(
          ExtendedQueries.docProfile(s, d), col("text"), col("doc_id"))
        .agg(graft.functions.FreqItemsAgg.freqItems(col("tok"), 64).as("items"))
        .select(posexplode(col("items")))
      sketch
        .select((col("pos") + 1).cast("long").as("rk"),
          col("col.item").as("tok"), col("col.est").as("n"))
        .filter(col("rk") <= 20)
        .orderBy(col("rk"))
    },

    // Gopher-style duplicate-token fraction: row-local split/distinct
    // stats, one filter — the repetition gate of a quality pipeline.
    "q_repeat_tokens" -> { (s, d) =>
      val (nTok, nDis, dupFrac) = CorpusStats.repetitionStats(col("text"))
      ExtendedQueries.docProfile(s, d)
        .select(col("doc_id"), nTok.as("n_tok"), nDis.as("n_distinct"),
          dupFrac.as("dup_frac"))
        .filter(col("dup_frac") > 0.5)
        .orderBy(col("dup_frac").desc, col("doc_id"))
    },

    // Most frequent bigram per doc + covered fraction of bigram slots
    // (the Gopher top-2-gram rule). Explode + three hash aggregates —
    // the per-doc argmax is min(struct(-c, bg)), not a rank window, so
    // the second exchange carries one partial struct per doc instead of
    // every distinct (doc, bigram, count) row. Ties break
    // lexicographically (struct field-order comparison).
    "q_top_bigram" -> { (s, d) =>
      // shared (id, bg, c) count cache (built once, also feeds the
      // bigram-LM scorer): the whole query is one hash aggregate over
      // it — no per-run explode
      CorpusStats.topBigramFromCounts(docBigramCounts(s, d))
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("doc_id"))
    },

    // BPE-style merge-candidate counting: the top adjacent CHARACTER
    // pairs across the corpus, weighted by word frequency — the first
    // merge step of byte-pair-encoding vocab induction. The standard
    // scale trick is structural here: pairs explode over the VOCAB
    // (distinct words + counts, one hash agg away from the corpus),
    // never over raw text — pair-count cost follows |vocab|·|word
    // length|, not corpus tokens. Exact integer counts; ties break on
    // the pair string.
    // BPE ENCODE under the oracle — tokenizer APPLICATION, the LM
    // pipeline's most-used op (q_bpe_pairs declares only the
    // pair-count step). A FIXED 8-merge table (cascading: t+h → th+e)
    // embeds as literals in both engines; greedy left-to-right
    // non-overlapping merge application is deterministic string work.
    // Scale shape = Bpe.tokenCounts': the interpreted merge fold runs
    // once per DISTINCT word (the vocabulary — 31 rows here, one hash
    // agg away from the corpus at any scale), and the corpus side is
    // an equi-join of position-exploded words against that dictionary
    // (AQE broadcasts it while small) plus one per-doc aggregate that
    // reassembles the token sequence in position order. No fold ever
    // touches a corpus row. Output is (n_tok, md5(joined tokens)) per
    // doc — sequence-exact, no ARRAY finals (§7.3).
    // DuckDB mirrors the greedy fold with the separator-prefix string
    // encoding: repr = SEP before every char (SEP = chr(1), absent
    // from the ASCII corpus), merge (a,b) = replace(SEP·a·SEP·b →
    // SEP·ab). replace scans left-to-right, non-overlapping, never
    // rescanning replaced output — exactly the fold's semantics; the
    // inert SEP·space symbols are word boundaries no merge can cross
    // (merge symbols never contain a space).
    "q_bpe_encode" -> { (s, d) =>
      val docs = ExtendedQueries.docProfile(s, d)
      val wordsOf =
        filter(split(col("text"), " "), w => length(w) >= lit(1))
      val dict = docs
        .select(explode(wordsOf).as("w")).distinct()
        // wt is a real projected attribute BEFORE anything references
        // it twice: the encode fold is a lambda subtree (no CSE) and
        // CollapseProject keeps non-cheap expressions un-duplicated
        .select(col("w"),
          array_join(graft.ops.Bpe.encode(col("w"), bpeOracleMerges), " ")
            .as("wt"))
      val perDoc = docs
        .select(col("doc_id"), posexplode(wordsOf).as(Seq("pos", "w")))
        // broadcast the DICTIONARY side explicitly (r19, guide §3.1):
        // un-hinted, the planner size-estimates the posexplode side
        // through Generate (which barely inflates its input estimate)
        // as the smaller relation and broadcasts the position-exploded
        // CORPUS — every word occurrence collected to the driver and
        // shipped to every executor (r18 plan: BroadcastHashJoin
        // BuildLeft over Generate(posexplode)). That is backwards at
        // every scale: occurrences ≥ distinct words by construction
        // (the dict IS the distinct of the same explode), the vocab
        // grows sub-linearly in the corpus (Heaps' law) while
        // occurrences grow linearly, and at 100 TB an occurrence
        // broadcast is a driver OOM where the vocabulary is the
        // textbook broadcast dimension. The hint also keeps the
        // corpus side entirely un-shuffled until the per-doc
        // aggregate's own doc_id exchange.
        // Measured (isolated min-of-9, sf0.1, idle): 0.939 → 0.444 s,
        // stages flat at 17, shuffle 3.907 → 4.379 MB (broadcasts are
        // not shuffle bytes — the +0.47 MB is the doc-agg partials'
        // changed row ordering compressing worse, the 0.495 s win is
        // the removed occurrence-relation driver collect + hash-
        // relation build; plan 31 → 27 nodes,
        // plans/r19/q_bpe_encode_before/after.txt). Oracle green at
        // 3 SFs post-change; shuffle budgets re-baselined 1.3×.
        .join(broadcast(dict), "w")
        .groupBy(col("doc_id"))
        .agg(
          sum(size(split(col("wt"), " ")).cast("long")).as("n_tok"),
          // pos is unique per doc, so the struct sort is total and the
          // reassembled sequence is partition-order-independent
          md5(array_join(
            transform(array_sort(collect_list(struct(col("pos"), col("wt")))),
              x => x.getField("wt")), " ").cast("binary")).as("tok_md5"))
      // left-join back to docs (the q_boilerplate_strip pattern, r13
      // ADVICE): a doc whose text is empty/whitespace-only explodes to
      // zero word rows and would otherwise emit no output row, while
      // the oracle emits (0, md5('')) for every document.
      docs.select(col("doc_id"))
        .join(perDoc, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_tok"), lit(0L)).as("n_tok"),
          coalesce(col("tok_md5"), md5(lit("").cast("binary"))).as("tok_md5"))
        .orderBy(col("doc_id"))
    },

    "q_bpe_pairs" -> { (s, d) =>
      // the op's own corpus→vocab aggregate (q_bpe_pairs declares
      // Bpe's pair-count step — one builder, no drift)
      val vocab = graft.ops.Bpe.vocabulary(
          ExtendedQueries.docProfile(s, d), col("text"))
        .filter(length(col("tok")) >= 2)
      vocab
        .select(col("wc"), explode(
          transform(sequence(lit(1), length(col("tok")) - 1),
            i => col("tok").substr(i, lit(2)))).as("pair"))
        .groupBy(col("pair")).agg(sum(col("wc")).as("n"))
        .orderBy(col("n").desc, col("pair"))
        .limit(20)
    },

    // Okapi BM25 retrieval as a DECLARED query: rank documents for a
    // fixed bag-of-words query over the shared (id, tok, c) counts.
    // The per-(doc, term) contribution is a pure row-local IEEE double
    // chain (association order mirrored operation-for-operation in the
    // oracle SQL), carried as round(contrib·1e6) BIGINT so the per-doc
    // sum is an exact integer under any partitioning (§7.3). Scale
    // shape: the term IN-filter is pushed to the counts scan — only
    // |terms|·df postings rows ever move; doc lengths and corpus
    // constants come from the memoized counts (build-once/rank-many,
    // the same lifecycle as the IVF and bloom models); final top-k is
    // TakeOrderedAndProject.
    "q_bm25" -> { (s, d) =>
      val counts = docTokenCounts(s, d)
      val lens = ExtendedQueries.memoCache("doclens", s, d) {
        CorpusStats.docLengths(counts)
      }
      val nDocs = ExtendedQueries.memoCount("ndocs", s, d) {
        t(s, d, "documents").count()
      }
      val nToks = ExtendedQueries.memoCount("ntoks", s, d) {
        counts.agg(sum(col("c"))).head.getLong(0)
      }
      CorpusStats.bm25SearchFp(counts, lens, nDocs,
          avgLen = nToks.toDouble / nDocs.toDouble,
          queryTerms = Seq("spark", "join", "window", "scan"), k = 15)
        .select(col("id").as("doc_id"), col("score_fp"),
          col("n_terms_matched"))
    },

    // Per-doc score under the corpus's own MLE bigram LM (fluency /
    // quality signal). The model tables derive from the same
    // (doc, bigram) counts being scored; all ln terms are fixed-point
    // micro-nat BIGINTs, so the per-doc sums are exact integers under
    // any partitioning; one double division (avg nats) at the end.
    // The (doc, bigram) counts are memoized (the explode dominates a
    // fresh run) — at scale this is the persisted bigram-count table
    // both the model build and the scorer read.
    "q_bigram_lm" -> { (s, d) =>
      // both cached frames are partitioned on the bigram key, so the
      // per-run score join is exchange-free: the only shuffle left is
      // the per-doc partial-aggregate merge (|docs|-sized)
      val docBg = docBigramCounts(s, d)
      val model = ExtendedQueries.memoCache("bgmodel", s, d) {
        CorpusStats.bigramLmModel(docBg)
          .repartition(s.sparkContext.defaultParallelism, col("bg"))
      }
      CorpusStats.bigramLmScoreWithModel(docBg, model)
        .select(col("id").as("doc_id"), col("n_bg"), col("score_fp"),
          col("avg_nats"))
        .orderBy(col("doc_id"))
    },

    // Exact PHRASE search via positional postings (r18 — the
    // inverted-index read shape): tokens explode with position, the
    // frame is filtered to the phrase's two terms in the scan stage
    // (against a persisted postings table this is the index fetch —
    // the phrase terms' postings, never the corpus), each term
    // anchors to its candidate start, and the (id, start) equi-join
    // keeps exactly the starts where BOTH terms sit at their
    // offsets. Overlapping occurrences each count. The oracle
    // recomputes positions with a loop-free list_transform scan —
    // an adjacency the postings join missed or invented
    // hash-mismatches on n_occ.
    "q_phrase_search" -> { (s, d) =>
      CorpusStats.phraseOccurrences(t(s, d, "documents"),
          col("text"), col("doc_id"), Seq("table", "scan"))
        .select(col("id").as("doc_id"), col("n_occ"))
        .orderBy(col("doc_id"))
    },

    // Per-doc token-distribution entropy in exact fixed-point integer
    // sums (partition-order independent — a double Σ c·ln(c) would
    // drift at 1000 executors). Two map-side-combinable aggregates.
    "q_doc_entropy" -> { (s, d) =>
      CorpusStats.tokenEntropyFromCounts(docTokenCounts(s, d))
        .select(col("id").as("doc_id"), col("n"), col("entropy"))
        .orderBy(col("doc_id"))
    },

    // Exact multi-quantile profile per group (quartiles of order value
    // by priority) — ONE percentile aggregate evaluates all three
    // cut-points in a single pass, then the array is flattened to
    // scalar columns (the driver comparator is scalar-proven). Exact
    // percentile is the declared semantics; approx_percentile is the
    // sketch-based scale path (Sketches.scala) when a full per-group
    // collection is too expensive.
    "q_quantiles_multi" -> { (s, d) =>
      // r15: three interpolated quantiles from ONE rank window
      // (Quantiles.exactByGroup) — the interpreted percentile(array)
      // aggregate was 0.54 s of ObjectHashAggregate map updates
      graft.ops.Quantiles.exactByGroup(t(s, d, "orders"),
          col("o_orderpriority"), col("o_totalprice"),
          cont = Seq(("c25", 0.25), ("c50", 0.5), ("c75", 0.75)))
        .select(col("o_orderpriority"), col("__n_rows").as("n"),
          round(col("c25"), 4).as("q25"),
          round(col("c50"), 4).as("q50"),
          round(col("c75"), 4).as("q75"))
        .orderBy(col("o_orderpriority"))
    }
  )

  val sql: Map[String, String] = Map(
    "q_heavy_hitters" ->
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
        |cnt AS (SELECT tok, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY tok)
        |SELECT CAST(row_number() OVER (ORDER BY n DESC, tok) AS BIGINT) AS rk, tok, n
        |FROM cnt ORDER BY rk LIMIT 20""".stripMargin,

    "q_token_df" ->
      """WITH tok AS (SELECT doc_id AS id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |pd AS (SELECT tok, id, count(*) AS c FROM tok GROUP BY 1, 2)
        |SELECT tok, CAST(sum(c) AS BIGINT) AS tf, CAST(count(*) AS BIGINT) AS df
        |FROM pd GROUP BY tok
        |ORDER BY tf DESC, tok LIMIT 40""".stripMargin,

    "q_bpe_encode" -> {
      // nested replace chain in merge-table order over the
      // separator-prefix encoding (see the query comment); merge
      // symbols are plain lowercase letters, SQL-literal-safe
      val rep = bpeOracleMerges.foldLeft("r") { case (acc, (a, b)) =>
        s"replace($acc, chr(1) || '$a' || chr(1) || '$b', chr(1) || '${a + b}')"
      }
      s"""WITH r0 AS (SELECT doc_id,
         |              regexp_replace(text, '(.)', chr(1) || '\\1', 'gs') AS r
         |            FROM documents),
         |r1 AS (SELECT doc_id, $rep AS r FROM r0),
         |j AS (SELECT doc_id,
         |        replace(substr(replace(r, chr(1) || ' ', ''), 2), chr(1), ' ') AS tok_str
         |      FROM r1)
         |SELECT doc_id,
         |  CAST(CASE WHEN length(tok_str) = 0 THEN 0
         |            ELSE len(string_split(tok_str, ' ')) END AS BIGINT) AS n_tok,
         |  md5(tok_str) AS tok_md5
         |FROM j ORDER BY doc_id""".stripMargin
    },

    "q_bpe_pairs" ->
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
        |vocab AS (SELECT tok, CAST(count(*) AS BIGINT) AS wc
        |          FROM tok WHERE len(tok) >= 2 GROUP BY tok),
        |pairs AS (SELECT substring(tok, i, 2) AS pair, wc
        |          FROM vocab, LATERAL (SELECT unnest(generate_series(1, len(tok) - 1)) AS i))
        |SELECT pair, CAST(sum(wc) AS BIGINT) AS n
        |FROM pairs GROUP BY pair
        |ORDER BY n DESC, pair LIMIT 20""".stripMargin,

    // Mirrors bm25SearchFp's double chain operation-for-operation:
    // every float literal is CAST to DOUBLE (bare DuckDB numeric
    // literals are DECIMAL — different arithmetic), association
    // matches the Column expression exactly, and the only
    // cross-partition reduction is the exact BIGINT fixed-point sum.
    "q_bm25" ->
      """WITH tok AS (SELECT doc_id AS id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |cnt AS (SELECT id, tok, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1, 2),
        |lens AS (SELECT id, CAST(sum(c) AS BIGINT) AS len FROM cnt GROUP BY 1),
        |consts AS (SELECT CAST((SELECT count(*) FROM documents) AS BIGINT) AS n,
        |                  CAST((SELECT sum(c) FROM cnt) AS DOUBLE) /
        |                  CAST((SELECT count(*) FROM documents) AS DOUBLE) AS avg_len),
        |post AS (SELECT * FROM cnt WHERE tok IN ('spark', 'join', 'window', 'scan')),
        |dfs AS (SELECT tok, ln(CAST(1.0 AS DOUBLE) +
        |          ((CAST((SELECT n FROM consts) AS DOUBLE) - CAST(count(*) AS BIGINT)) + CAST(0.5 AS DOUBLE)) /
        |          (CAST(count(*) AS BIGINT) + CAST(0.5 AS DOUBLE))) AS idf
        |        FROM post GROUP BY tok),
        |sc AS (SELECT post.id AS id,
        |         CAST(round(((dfs.idf * (post.c * CAST(2.2 AS DOUBLE))) /
        |           (post.c + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE) +
        |             (CAST(0.75 AS DOUBLE) * lens.len) / consts.avg_len))) *
        |           CAST(1000000 AS DOUBLE)) AS BIGINT) AS fp
        |       FROM post JOIN dfs ON post.tok = dfs.tok
        |                 JOIN lens ON post.id = lens.id
        |                 CROSS JOIN consts)
        |SELECT id AS doc_id, CAST(sum(fp) AS BIGINT) AS score_fp,
        |       CAST(count(*) AS BIGINT) AS n_terms_matched
        |FROM sc GROUP BY id
        |ORDER BY score_fp DESC, doc_id LIMIT 15""".stripMargin,

    "q_tfidf_top" ->
      """WITH tok AS (SELECT doc_id AS id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |tf AS (SELECT id, tok, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2),
        |df AS (SELECT tok, CAST(count(DISTINCT id) AS BIGINT) AS df FROM tok GROUP BY 1),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
        |sc AS (SELECT id, tf.tok AS tok, tf,
        |         tf * CAST(round(ln((n.n + 1) / (df.df + 1.0)) * 1000000) AS BIGINT) AS score_fp
        |       FROM tf JOIN df ON tf.tok = df.tok CROSS JOIN n),
        |rk AS (SELECT *, row_number() OVER (PARTITION BY id ORDER BY score_fp DESC, tok) AS rk FROM sc)
        |SELECT id AS doc_id, tok, tf, score_fp, CAST(rk AS BIGINT) AS rk
        |FROM rk WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin,

    "q_repeat_tokens" ->
      """SELECT doc_id,
        |       CAST(len(w) AS BIGINT) AS n_tok,
        |       CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct,
        |       round(1.0 - len(list_distinct(w)) / CAST(len(w) AS DOUBLE), 4) AS dup_frac
        |FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        |WHERE round(1.0 - len(list_distinct(w)) / CAST(len(w) AS DOUBLE), 4) > 0.5
        |ORDER BY dup_frac DESC, doc_id""".stripMargin,

    "q_top_bigram" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |bg AS (SELECT doc_id, CAST(len(w) - 1 AS BIGINT) AS n_bg,
        |         unnest(list_transform(range(2, len(w) + 1), i -> w[i-1] || ' ' || w[i])) AS bg
        |       FROM t WHERE len(w) >= 2),
        |c AS (SELECT doc_id, n_bg, bg, CAST(count(*) AS BIGINT) AS c FROM bg GROUP BY 1, 2, 3),
        |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, bg) AS rk FROM c)
        |SELECT doc_id, bg, c, round(c / CAST(n_bg AS DOUBLE), 4) AS frac
        |FROM r WHERE rk = 1 ORDER BY doc_id""".stripMargin,

    "q_bigram_lm" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |bg AS (SELECT doc_id,
        |         unnest(list_transform(range(2, len(w) + 1), i -> w[i-1] || ' ' || w[i])) AS bg
        |       FROM t WHERE len(w) >= 2),
        |dbg AS (SELECT doc_id, bg, CAST(count(*) AS BIGINT) AS c FROM bg GROUP BY 1, 2),
        |corpus AS (SELECT bg, CAST(sum(c) AS BIGINT) AS c_bg FROM dbg GROUP BY 1),
        |ctx AS (SELECT split_part(bg, ' ', 1) AS w1, CAST(sum(c_bg) AS BIGINT) AS c_w1
        |        FROM corpus GROUP BY 1),
        |sc AS (SELECT d.doc_id, CAST(sum(d.c) AS BIGINT) AS n_bg,
        |         CAST(sum(d.c * (CAST(round(ln(co.c_bg) * 1000000) AS BIGINT) -
        |                         CAST(round(ln(x.c_w1) * 1000000) AS BIGINT))) AS BIGINT) AS score_fp
        |       FROM dbg d
        |       JOIN corpus co USING (bg)
        |       JOIN ctx x ON split_part(d.bg, ' ', 1) = x.w1
        |       GROUP BY 1)
        |SELECT doc_id, n_bg, score_fp,
        |       round(score_fp / (n_bg * 1000000.0), 4) AS avg_nats
        |FROM sc ORDER BY doc_id""".stripMargin,

    "q_phrase_search" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |o AS (SELECT doc_id,
        |        list_sum(list_transform(range(1, len(w)), i ->
        |          CASE WHEN w[i] = 'table' AND w[i+1] = 'scan'
        |               THEN 1 ELSE 0 END)) AS n_occ
        |      FROM t WHERE len(w) >= 2)
        |SELECT doc_id, CAST(n_occ AS BIGINT) AS n_occ
        |FROM o WHERE n_occ > 0 ORDER BY doc_id""".stripMargin,

    "q_doc_entropy" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1, 2),
        |ag AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
        |         CAST(sum(c * CAST(round(ln(c) * 1000000) AS BIGINT)) AS BIGINT) AS s_fp
        |       FROM tf GROUP BY 1)
        |SELECT doc_id, n,
        |       round((CAST(round(ln(n) * 1000000) AS BIGINT) * n - s_fp) /
        |             (n * 1000000.0), 4) AS entropy
        |FROM ag ORDER BY doc_id""".stripMargin,

    "q_quantiles_multi" ->
      """WITH g AS (SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |                  quantile_cont(o_totalprice, [0.25, 0.5, 0.75]) AS q
        |           FROM orders GROUP BY o_orderpriority)
        |SELECT o_orderpriority, n,
        |       round(q[1], 4) AS q25, round(q[2], 4) AS q50, round(q[3], 4) AS q75
        |FROM g ORDER BY o_orderpriority""".stripMargin
  )
}
