package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys at cluster scale.
  *
  * A single pathological key (the empty document, a null-ish user id, a
  * default timestamp) can pull an entire 100 TB aggregation or join
  * onto one reducer. Two standard remedies, both pure DataFrame plans:
  *
  *  - **Salted two-phase aggregation**: group on (key, salt) first —
  *    spreading one hot key over `n` reducers — then merge the partial
  *    results per key. Works for any algebraic aggregate (sum, count,
  *    min, max; avg = sum/count at merge).
  *  - **Salted replicate join**: replicate the small side `n` times
  *    (one copy per salt) and salt the skewed side deterministically,
  *    so a hot join key fans across `n` reducers instead of one.
  *
  * Salts are DERIVED (hash of a distinguishing column), never
  * `rand()` — plans stay deterministic and retryable (a failed task
  * re-derives the same salt; `rand()` under retry can double-count).
  *
  * Spark's AQE skew-join handles many cases automatically at runtime;
  * these helpers cover aggregation skew (which AQE does not split) and
  * joins where the skew is known ahead of planning.
  */
object Skew {

  /** Deterministic salt in [0, n) derived from `from` (e.g. a row id). */
  def salt(from: Column, n: Int): Column = pmod(xxhash64(from), lit(n))

  /** Two-phase salted sum/count/min/max (and avg at merge) of
    * `valueCol` grouped by `keys`. Result columns: sum_v, cnt, min_v,
    * max_v, avg_v. Identical to a direct groupBy, but a hot key spreads
    * over `n` partial groups. `saltFrom` picks the salting column —
    * any value that varies within a key (a row id, a timestamp). */
  def saltedAgg(df: DataFrame, keys: Seq[String], valueCol: String,
      saltFrom: Column, n: Int = 16): DataFrame = {
    val partial = df
      .withColumn("__salt", salt(saltFrom, n))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(
        sum(col(valueCol)).as("__s"), count(col(valueCol)).as("__c"),
        min(col(valueCol)).as("__mn"), max(col(valueCol)).as("__mx"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col("__s")).as("sum_v"), sum(col("__c")).as("cnt"),
        min(col("__mn")).as("min_v"), max(col("__mx")).as("max_v"))
      .withColumn("avg_v", col("sum_v") / col("cnt"))
  }

  /** Inner equi-join where `skewed`'s join key is hot: replicate
    * `small` once per salt value and route each skewed row to one
    * replica. Exactly the rows of `skewed.join(small, key)`, spread
    * over `n` reducers per key. The small side must actually be small —
    * it is materialized `n` times (typically it is also broadcast, in
    * which case salting only matters when the join must shuffle, e.g.
    * the small side exceeds the broadcast threshold). */
  def saltedJoin(skewed: DataFrame, small: DataFrame, key: String,
      saltFrom: Column, n: Int = 16,
      forceShuffle: Boolean = false): DataFrame = {
    val saltedLeft = skewed.withColumn("__salt", salt(saltFrom, n))
    val replicated0 = small.withColumn("__salt",
      explode(array((0 until n).map(i => lit(i)): _*)))
    // forceShuffle pins a shuffle-hash join: when the replicated side
    // is under the broadcast threshold Catalyst would broadcast it and
    // the salt is decorative; the flag makes the salted SHUFFLE shape
    // (the case this operator exists for) reproducible at test scale.
    val replicated =
      if (forceShuffle) replicated0.hint("shuffle_hash") else replicated0
    saltedLeft.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
