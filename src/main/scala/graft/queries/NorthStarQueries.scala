package graft.queries

import org.apache.spark.sql.functions._

/** LLM-data-pipeline operators (BASELINE.json north_star): text
  * tokenization, exact dedup, vector cosine similarity — the declared
  * subset; wider dedup/similarity/text-analysis operators live in
  * graft.ops and ExtendedQueries.
  *
  * Scale notes: token counting is a map-side-combinable groupBy on the
  * exploded words (partial aggregation keeps the shuffle at
  * |vocabulary|, not |tokens|); exact dedup is a hash-groupBy on a
  * 128-bit fingerprint — both are the standard 100 TB-safe shapes.
  * Cosine uses the `zip_with`+`aggregate` higher-order functions, which
  * fold sequentially (deterministic order) inside codegen.
  */
object NorthStarQueries {

  val queries: Map[String, QFn] = Map(
    // Tokenize + per-word counts (split/explode/groupBy).
    "q_text_tokens" -> { (s, d) =>
      ExtendedQueries.docProfile(s, d)
        .select(explode(split(col("text"), " ")).as("word"))
        .filter(length(col("word")) > 0)
        .groupBy(col("word"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("word"))
    },

    // Exact dedup on a normalized fingerprint (md5 of the first 8
    // tokens — full texts are all unique in this corpus, the 8-token
    // prefix yields real duplicate groups). Emits one row per dup
    // group with the kept (min) doc_id — the "keep-first" policy.
    "q_dedup_exact" -> { (s, d) =>
      ExtendedQueries.docProfile(s, d)
        .select(
          md5(concat_ws(" ", slice(split(col("text"), " "), 1, 8)).cast("binary")).as("fp"),
          col("doc_id"))
        .groupBy(col("fp"))
        .agg(count(lit(1)).as("n_dups"), min(col("doc_id")).as("keep_id"))
        .filter(col("n_dups") > 1)
        .orderBy(col("fp"))
    },

    // Cosine similarity of consecutive vector pairs (vec_id i, i+1),
    // elements cast FLOAT→DOUBLE (exact), dot product via the codegen
    // kernel (same sequential IEEE fold as the zip_with+aggregate HOF
    // chain — bit-identical), rounded to 4 dp (SURVEY §7.3 rule 10).
    "q_similarity_cosine" -> { (s, d) =>
      import graft.functions.GraftFunctions.dot
      // Shared cached base (vec_id, double vector, norm) with the two
      // ExtendedQueries embed queries — norms computed once per vector.
      val e = ExtendedQueries.embedNorms(s, d).select("vec_id", "v", "nrm")
      val a = e.toDF("id1", "v1", "n1")
      val b = e.toDF("id2", "v2", "n2")
      a.join(b, col("id2") === col("id1") + 1)
        .select(col("id1"), col("id2"),
          round(dot(col("v1"), col("v2")) / (col("n1") * col("n2")), 4).as("cos"))
        .orderBy(col("id1"))
    },
  )

  val sql: Map[String, String] = Map(
    "q_text_tokens" ->
      """SELECT word, count(*) AS n
        |FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |WHERE length(word) > 0
        |GROUP BY word ORDER BY n DESC, word""".stripMargin,

    "q_dedup_exact" ->
      """SELECT md5(array_to_string((string_split(text, ' '))[1:8], ' ')) AS fp,
        |       count(*) AS n_dups, min(doc_id) AS keep_id
        |FROM documents
        |GROUP BY 1 HAVING count(*) > 1
        |ORDER BY fp""".stripMargin,

    "q_similarity_cosine" ->
      """SELECT a.vec_id AS id1, b.vec_id AS id2,
        |  round(
        |    list_sum(list_transform(range(1, 65), i -> av[i] * bv[i])) /
        |    (sqrt(list_sum(list_transform(range(1, 65), i -> av[i] * av[i]))) *
        |     sqrt(list_sum(list_transform(range(1, 65), i -> bv[i] * bv[i])))), 4) AS cos
        |FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS av FROM embeddings) a
        |JOIN (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS bv FROM embeddings) b
        |  ON b.vec_id = a.vec_id + 1
        |ORDER BY id1""".stripMargin,
  )
}
