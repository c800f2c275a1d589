package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float|double>`).
  *
  * Two paths:
  *  - `bruteForceTopK` — exact cosine top-k, O(n) per query. The
  *    correctness baseline, and the right choice when the corpus side
  *    fits one scan (queries broadcast).
  *  - `lshBuckets` / `lshTopK` — random-hyperplane (sign) LSH: each
  *    vector maps to a `nBits`-bit bucket; candidates share a bucket.
  *    At 100 TB this turns the quadratic pair space into
  *    per-bucket joins; probing neighbors' buckets trades recall for
  *    cost. Hyperplanes are generated deterministically from md5 of
  *    (seed, bit, dim) so every executor derives identical planes
  *    without shipping state.
  */
object Similarity {

  /** Sequential-fold cosine of two double-array columns (codegen'd
    * higher-order functions — no UDF). */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val na = sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, x) => acc + x))
    val nb = sqrt(aggregate(transform(b, x => x * x), lit(0.0), (acc, x) => acc + x))
    dot / (na * nb)
  }

  /** Exact top-k by cosine for one query vector (broadcast). */
  def bruteForceTopK(corpus: DataFrame, idCol: Column, vecCol: Column,
      query: DataFrame, queryVec: Column, k: Int): DataFrame = {
    val c = corpus.select(idCol.as("id"), vecCol.cast("array<double>").as("v"))
    val q = broadcast(query.select(queryVec.cast("array<double>").as("qv")))
    c.crossJoin(q)
      .select(col("id"), round(cosine(col("v"), col("qv")), 4).as("cos"))
      .orderBy(col("cos").desc, col("id"))
      .limit(k)
  }

  /** Deterministic pseudo-random hyperplane component for (seed, bit,
    * dim): md5-derived integer in [-8388608, 8388608). Direction-only
    * use means scale doesn't matter. */
  private def planeComponent(seed: Int, bit: Int, dim: Column): Column =
    (conv(substring(md5(concat_ws(":", lit(seed.toString), lit(bit.toString),
      dim.cast("string")).cast("binary")), 1, 6), 16, 10).cast("long") - lit(8388608L))
      .cast("double")

  /** Sign-LSH bucket id (a `nBits`-char '0'/'1' string) per vector. */
  def lshBuckets(corpus: DataFrame, idCol: Column, vecCol: Column,
      nBits: Int = 8, seed: Int = 42): DataFrame = {
    val v = vecCol.cast("array<double>")
    val bitCols = (0 until nBits).map { b =>
      // dot(v, plane_b) via posexplode-free HOF: weight each element
      // by the deterministic plane component for its index.
      val dot = aggregate(
        zip_with(v, sequence(lit(0), size(v) - 1), (x, i) =>
          x * (conv(substring(md5(concat_ws(":", lit(seed.toString), lit(b.toString),
            i.cast("string")).cast("binary")), 1, 6), 16, 10).cast("long") - lit(8388608L))
            .cast("double")),
        lit(0.0), (acc, x) => acc + x)
      when(dot >= 0, "1").otherwise("0")
    }
    corpus.select(idCol.as("id"), v.as("v"), concat(bitCols: _*).as("bucket"))
  }

  /** Approximate top-k: exact cosine within the query's LSH bucket.
    * Recall improves with fewer bits / multiple probe tables. */
  def lshTopK(corpus: DataFrame, idCol: Column, vecCol: Column,
      query: DataFrame, queryVec: Column, k: Int,
      nBits: Int = 8, seed: Int = 42): DataFrame = {
    val cb = lshBuckets(corpus, idCol, vecCol, nBits, seed)
    val qb = broadcast(
      lshBuckets(query, lit(0L), queryVec, nBits, seed)
        .select(col("v").as("qv"), col("bucket").as("qbucket")))
    cb.join(qb, col("bucket") === col("qbucket"))
      .select(col("id"), round(cosine(col("v"), col("qv")), 4).as("cos"))
      .orderBy(col("cos").desc, col("id"))
      .limit(k)
  }
}
