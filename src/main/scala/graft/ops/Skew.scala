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

  /** Detect hot keys in ONE pass with the Misra-Gries sketch: keys
    * whose estimated row share is at least `threshold`. The sketch
    * undercounts by at most rows/capacity, so pick
    * `capacity ≥ 2/threshold` (default pairing 200 ↔ 1%) and every key
    * at/above threshold surfaces; marginal keys may come along —
    * harmless, salting a warm key costs nothing. Returns the keys'
    * STRING renderings (the sketch coerces its input to string):
    * `partialSaltedJoin`'s isin() compares them back against the
    * typed column via Spark's implicit cast, but a caller comparing
    * typed values directly (hot.contains(42L)) matches nothing —
    * parse the strings first. */
  def hotKeys(df: DataFrame, key: Column, threshold: Double = 0.01,
      capacity: Int = 200): Seq[Any] = {
    require(capacity >= 2 / threshold,
      s"capacity $capacity too small for threshold $threshold (want ≥ ${2 / threshold})")
    val row = df.agg(
      graft.functions.FreqItemsAgg.freqItems(key, capacity).as("top"),
      count(lit(1)).as("n")).head()
    val n = row.getAs[Long]("n")
    row.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("top")
      .filter(r => r.getLong(1) >= (threshold * n - n / capacity).ceil.toLong)
      .map(_.get(0)).filter(_ != null).toSeq
  }

  /** Partial-salted inner equi-join: ONLY rows carrying a hot key are
    * salted, and only the hot keys' small-side rows replicate — cold
    * keys keep salt 0 and exactly one small-side copy. One join, one
    * plan; the small side's shuffle volume grows by (n−1)·|hot rows|
    * instead of (n−1)·|small| as in [[saltedJoin]] — the difference
    * between "replicate a few dictionary entries" and "replicate the
    * dictionary" at 100 TB. Feed `hot` from [[hotKeys]] (profiling
    * pass) or from known pathological values. Result rows equal
    * `skewed.join(small, key)` exactly. */
  def partialSaltedJoin(skewed: DataFrame, small: DataFrame, key: String,
      saltFrom: Column, hot: Seq[Any], n: Int = 16,
      forceShuffle: Boolean = false): DataFrame = {
    require(n >= 1, "salt fan-out must be at least 1")
    def isHot(c: Column): Column =
      if (hot.isEmpty) lit(false) else coalesce(c.isin(hot: _*), lit(false))
    val saltedLeft = skewed.withColumn("__salt",
      when(isHot(col(key)), salt(saltFrom, n)).otherwise(lit(0L)))
    val replicated0 = small.withColumn("__salt", explode(
      when(isHot(col(key)), array((0 until n).map(i => lit(i.toLong)): _*))
        .otherwise(array(lit(0L)))))
    val replicated =
      if (forceShuffle) replicated0.hint("shuffle_hash")
      else broadcast(replicated0)
    saltedLeft.join(replicated, Seq(key, "__salt")).drop("__salt")
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
    // The un-forced path pins the broadcast on the REPLICATED side:
    // without the hint, size-only estimation (no CBO) carries the
    // child's size through the Aggregate+Generate feeding `small`, so
    // the few-row dim "looks" bigger than the pruned fact scan and
    // Catalyst broadcasts the FACT — backwards at any scale. The
    // operator's contract is that `small` is small; when it is not,
    // the salted-shuffle regime (forceShuffle) is the right call
    // anyway.
    val replicated =
      if (forceShuffle) replicated0.hint("shuffle_hash")
      else broadcast(replicated0)
    saltedLeft.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
