package graft.queries

import org.apache.spark.sql.functions._

/** Declared training-prep queries (SURVEY §2.11 extension): the two
  * assignment steps between a cleaned corpus and a training run,
  * backed by `graft.ops.TrainPrep`.
  *
  * Both are exact-integer / hash-deterministic, so the DuckDB oracle
  * hash-matches bit-for-bit (hex md5 compare and integer `div` have
  * identical semantics in both engines).
  */
object TrainPrepQueries {

  val queries: Map[String, QFn] = Map(
    // Deterministic content-hash train/val/test split: per-split doc
    // and token counts. Row-local hash — no shuffle before the final
    // 3-group aggregate; a document never migrates splits when the
    // corpus grows (md5(text) is stable), the property eval hygiene
    // depends on.
    "q_train_split" -> { (s, d) =>
      ExtendedQueries.docProfile(s, d)
        .select(col("doc_id"),
          graft.ops.TrainPrep.splitLabel(col("text")).as("split"),
          size(split(col("text"), " ")).cast("long").as("n_tok"))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tok"))
        .orderBy(col("split"))
    },

    // Greedy fixed-budget sequence packing: shard by doc_id % 8
    // (shards pack in parallel — the sequential cumsum is confined to
    // one window partition per shard), assign each doc the bin where
    // its first token lands (budget 2048), report per-bin occupancy.
    // Window shuffles once on the shard key; aggregate reuses it.
    "q_pack_sequences" -> { (s, d) =>
      val docs = ExtendedQueries.docProfile(s, d)
        .select(col("doc_id"), (col("doc_id") % 8).as("shard_key"),
          size(split(col("text"), " ")).cast("long").as("n_tok"))
      graft.ops.TrainPrep.packBins(
          docs, col("shard_key"), col("doc_id"), col("n_tok"), budget = 2048L)
        .groupBy(col("shard"), col("bin"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tok"),
          min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
        .orderBy(col("shard"), col("bin"))
    },

    // Decontamination: train-split docs sharing ≥5 distinct 3-gram
    // shingles with the eval (val+test) splits — the benchmark-leakage
    // sweep. Both sides dedup to distinct (doc, shingle) / (shingle)
    // sets BELOW the join, so per-doc repetition never reaches the
    // exchange and the eval side is benchmark-sized by construction.
    "q_decontaminate" -> { (s, d) =>
      // one corpus scan builds the split-labeled distinct shingle
      // cache once per session; the sweep itself reads the two
      // derived caches (train index + eval set), co-partitioned AND
      // pre-sorted on the shingle key, so the overlap join runs with
      // no exchange and no train-side sort — the only shuffle left is
      // the per-doc aggregate merge
      graft.ops.TrainPrep.decontaminateFromShingles(
          ExtendedQueries.trainShingleIdx(s, d),
          ExtendedQueries.evalShingleSet(s, d),
          minOverlap = 5L, trainDistinct = true, broadcastEval = false)
        .select(col("id").as("doc_id"), col("n_overlap"))
        .orderBy(col("doc_id"))
    },

    // Deterministic stratified sample: language-weighted corpus
    // rebalance (drop zh entirely, halve en, quarter de, keep fr/es)
    // — per-lang survivor counts. The keep decision is a pure function
    // of the text hash, so the DuckDB oracle reproduces it exactly.
    "q_sample_stratified" -> { (s, d) =>
      graft.ops.TrainPrep.stratifiedSample(
          ExtendedQueries.docProfile(s, d), col("lang"), col("text"),
          Map("en" -> 0.5, "fr" -> 1.0, "es" -> 1.0, "de" -> 0.25))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("first_doc"))
        .orderBy(col("lang"))
    },

    // Overlapping token-window chunking (context-window prep / RAG
    // indexing): 32-token windows every 24 tokens; chunk text verified
    // by hash. Row-local explode — no shuffle before the final sort.
    "q_chunk_windows" -> { (s, d) =>
      graft.ops.TrainPrep.chunkTokens(
          ExtendedQueries.docProfile(s, d), col("text"), col("doc_id"),
          chunkSize = 32, overlap = 8)
        .select(col("id").as("doc_id"), col("chunk_start"), col("n_tok"),
          md5(col("chunk_text")).as("chunk_md5"))
        .orderBy(col("doc_id"), col("chunk_start"))
    },

    // Deterministic corpus mixing: fractional per-language epoch
    // weights (en 1.5, fr 2.25, es 0.5, de 3.0; zh dropped) — row
    // counts per (lang, epoch copy). The fractional extra copy is a
    // pure function of the text hash, so the oracle reproduces it.
    "q_mix_epochs" -> { (s, d) =>
      // fingerprint first, project text away: the explode amplifies
      // three narrow columns (~40 bytes/copy), never document text
      val narrow = ExtendedQueries.docProfile(s, d)
        .select(col("doc_id"), col("lang"),
          graft.ops.TrainPrep.keyFingerprint(col("text")).as("__fp"))
      graft.ops.TrainPrep.mixCorpusFp(narrow, col("lang"), col("__fp"),
          Map("en" -> 1.5, "fr" -> 2.25, "es" -> 0.5, "de" -> 3.0))
        .groupBy(col("lang"), col("epoch"))
        .agg(count(lit(1)).as("n_rows"), min(col("doc_id")).as("first_doc"))
        .orderBy(col("lang"), col("epoch"))
    },

    // Bloom-pruned join: big side filtered below its shuffle by a
    // bloom sketch of the small side's keys — semantically EXACT (the
    // join removes false positives), so the oracle is the plain join.
    // Declares the pruning operator through the equivalence property.
    // The sketch is memoized per (session, dir) — the build-once/
    // probe-many lifecycle BloomPrune exists for (same precedent as
    // the ivfModel memo): one aggregate pays for every later probe,
    // and releaseCaches charges a cold run the rebuild. Both keys are
    // int64 (t() schema), so no width normalization is needed and the
    // memoized probe is hash-domain-identical to prunedJoin's.
    "q_bloom_prune_join" -> { (s, d) =>
      val li = t(s, d, "lineitem")
      val hotParts = t(s, d, "part")
        .filter(col("p_partkey") % 10 === 0)
        .select(col("p_partkey"), col("p_brand"))
      val bf = ExtendedQueries.memoBytes("bloomfilter", s, d)(
        graft.ops.BloomPrune.buildFilter(hotParts, col("p_partkey"),
          expectedItems = 100000L, numBits = 1L << 20))
      li.filter(graft.ops.BloomPrune.mightContain(bf, col("l_partkey")))
        .join(hotParts, col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_items"),
          // decimal sum: partition-order-independent AND oracle-exact
          sum(col("l_quantity").cast("decimal(18,4)")).cast("double").as("sum_qty"))
        .orderBy(col("p_brand"))
    },
  )

  val sql: Map[String, String] = Map(
    "q_train_split" ->
      """SELECT CASE WHEN md5(text) < '0d' THEN 'val'
        |            WHEN md5(text) < '29' THEN 'test'
        |            ELSE 'train' END AS split,
        |       count(*) AS n_docs,
        |       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tok
        |FROM documents
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_pack_sequences" ->
      """WITH toks AS (
        |  SELECT doc_id, doc_id % 8 AS shard,
        |         len(string_split(text, ' ')) AS n_tok
        |  FROM documents
        |), cum AS (
        |  SELECT doc_id, shard, n_tok,
        |         sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
        |  FROM toks
        |)
        |SELECT shard, CAST((c - n_tok) // 2048 AS BIGINT) AS bin,
        |       count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tok,
        |       min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM cum
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_decontaminate" ->
      """WITH labeled AS (
        |  SELECT doc_id, text,
        |         CASE WHEN md5(text) < '0d' THEN 'val'
        |              WHEN md5(text) < '29' THEN 'test'
        |              ELSE 'train' END AS split
        |  FROM documents
        |), sh AS (
        |  SELECT doc_id, split, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
        |  FROM (SELECT doc_id, split, string_split(text, ' ') AS w FROM labeled)
        |       , unnest(range(1, greatest(len(w) - 1, 1))) AS u(i)
        |  WHERE len(w) >= 3
        |), tsh AS (SELECT DISTINCT doc_id, s FROM sh WHERE split = 'train'),
        |   esh AS (SELECT DISTINCT s FROM sh WHERE split <> 'train')
        |SELECT t.doc_id, count(*) AS n_overlap
        |FROM tsh t JOIN esh e USING (s)
        |GROUP BY 1 HAVING count(*) >= 5
        |ORDER BY 1""".stripMargin,

    "q_sample_stratified" ->
      """SELECT lang, count(*) AS n_docs, min(doc_id) AS first_doc
        |FROM documents
        |WHERE (lang = 'en' AND substr(md5(text), 1, 4) < '8000')
        |   OR lang = 'fr' OR lang = 'es'
        |   OR (lang = 'de' AND substr(md5(text), 1, 4) < '4000')
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_chunk_windows" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        |SELECT doc_id, i AS chunk_start,
        |       CAST(len(list_slice(w, i + 1, i + 32)) AS BIGINT) AS n_tok,
        |       md5(array_to_string(list_slice(w, i + 1, i + 32), ' ')) AS chunk_md5
        |FROM w, unnest(range(0, len(w), 24)) AS u(i)
        |ORDER BY 1, 2""".stripMargin,

    "q_mix_epochs" ->
      """WITH m AS (
        |  SELECT lang, doc_id,
        |    CASE lang WHEN 'en' THEN 1 WHEN 'fr' THEN 2
        |              WHEN 'es' THEN 0 WHEN 'de' THEN 3 ELSE 0 END
        |    + CASE WHEN lang = 'en' AND substr(md5(text), 1, 4) < '8000' THEN 1
        |           WHEN lang = 'fr' AND substr(md5(text), 1, 4) < '4000' THEN 1
        |           WHEN lang = 'es' AND substr(md5(text), 1, 4) < '8000' THEN 1
        |           ELSE 0 END AS copies
        |  FROM documents
        |)
        |SELECT lang, e AS epoch, count(*) AS n_rows, min(doc_id) AS first_doc
        |FROM m, unnest(range(0, copies)) AS u(e)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_bloom_prune_join" ->
      """SELECT p_brand, count(*) AS n_items,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |JOIN (SELECT p_partkey, p_brand FROM part WHERE p_partkey % 10 = 0) p
        |  ON l_partkey = p_partkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
