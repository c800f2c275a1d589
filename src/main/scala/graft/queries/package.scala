package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.LongType

/** Shared plumbing for the declared query inventory (SURVEY.md §2.11).
  *
  * Every declared query is implemented twice: as a Spark DataFrame plan
  * here, and as DuckDB SQL (the driver's oracle) in the same category
  * object. Oracle SQL references the tables by bare name (`lineitem`,
  * `orders`, …) per the driver contract example in SparkEntry's scaladoc;
  * the driver materializes each `{sfDir}/<table>.parquet` under that name.
  *
  * Determinism rules (SURVEY.md §7.3) applied throughout:
  *  - every query ends with ORDER BY over a unique key combination;
  *  - order-dependent double reductions go through exact DECIMAL(18,4)
  *    sums (the testdata's doubles carry ≤2 decimal places, so the
  *    double→decimal cast is exact on both engines);
  *  - per-row double arithmetic is left unrounded (bit-identical IEEE
  *    ops on both sides); only genuinely divergent reductions
  *    (cosine dot product) are rounded to 4 dp;
  *  - derived integer outputs are cast to BIGINT on both sides (DuckDB
  *    year()/rank()/length() return BIGINT where Spark returns INT).
  */
package object queries {
  /** Signature the driver invokes: (session, sfDir) => result. */
  type QFn = (SparkSession, String) => DataFrame

  /** Load one driver-generated parquet table.
    *
    * `events.parquet` carries TIMESTAMP(NANOS), which Spark's parquet
    * reader rejects outright (DuckDB silently truncates it to micros).
    * With `spark.sql.legacy.parquet.nanosAsLong=true` the column reads
    * as a LongType nanosecond count; convert it here to a micro
    * timestamp via integral division — matching DuckDB's truncation —
    * and to TIMESTAMP_NTZ so written output carries the same
    * no-timezone annotation DuckDB produces.
    */
  def t(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // Memoized per (session, dir, table): the returned frame is only an
    // analyzed plan (no data is cached), but building it costs a file
    // listing + parquet footer read + analysis — a real slice of the
    // ~0.1 s per-query floor when 60+ queries each load 1-3 tables per
    // invocation. The driver's testdata is immutable for a session's
    // lifetime, so reusing the relation is safe; sessions that replace
    // files underneath must call spark.catalog.refreshByPath.
    val k = (spark, sfDir, name)
    val hit = tableMemo.get(k)
    if (hit != null) return hit
    // miss path: first drop entries of stopped sessions so a
    // session-per-batch embedder can't pin dead sessions in this static
    // map forever. Done OUTSIDE computeIfAbsent's mapping function —
    // mutating other mappings from inside one violates the CHM contract.
    val it = tableMemo.keySet.iterator
    while (it.hasNext) if (it.next()._1.sparkContext.isStopped) it.remove()
    val it2 = sessionsConfigured.iterator
    while (it2.hasNext) if (it2.next().sparkContext.isStopped) it2.remove()
    tableMemo.computeIfAbsent(k, { _ =>
      // conf check once per session, not once per table load — but the
      // session is marked configured only AFTER the set lands, inside
      // the lock: with a bare add()-then-set, a concurrent first caller
      // for another table would see the session already marked and
      // read nano-timestamp parquet before the winner's conf.set ran
      if (!sessionsConfigured.contains(spark)) sessionsConfigured.synchronized {
        if (!sessionsConfigured.contains(spark)) {
          if (spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").isEmpty)
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          sessionsConfigured.add(spark)
        }
      }
      val df = spark.read.parquet(s"$sfDir/$name.parquet")
      df.schema.fields.foldLeft(df) { (acc, f) =>
        if (f.name == "ts" && f.dataType == LongType)
          acc.withColumn("ts",
            timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
        else acc
      }
    })
  }

  private val tableMemo = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String, String), DataFrame]()
  // conf check once per session, not once per table load
  private val sessionsConfigured =
    java.util.concurrent.ConcurrentHashMap.newKeySet[SparkSession]()

  /** TWO-LEVEL cube: aggregate to the finest `keys` groups with
    * `inner` (one ordinary partial+final pass), then cube the
    * |groups|-sized result with `outer`. A direct `cube()` Expands
    * the INPUT once per grouping set before the partial aggregate;
    * here the Expand multiplies a handful of pre-aggregated rows.
    *
    * CORRECTNESS PRECONDITION (the reason this is one helper, not two
    * inline copies): `outer` must re-aggregate `inner`'s outputs
    * ADDITIVELY — counts become sums, sums re-sum (exact for integer
    * and DECIMAL sums; NOT for float sums, medians, distinct counts).
    * The output multiset is then identical to the single-level cube:
    * the outer cube keys its own grouping sets, so null-marker rows
    * and `grouping()` ids fall out exactly as from the direct form,
    * and a real null in a key stays one detail group. */
  private[queries] def twoLevelCube(df: DataFrame,
      keys: Seq[org.apache.spark.sql.Column])(
      inner: Seq[org.apache.spark.sql.Column],
      outer: Seq[org.apache.spark.sql.Column]): DataFrame =
    df.groupBy(keys: _*).agg(inner.head, inner.tail: _*)
      .cube(keys: _*).agg(outer.head, outer.tail: _*)
}
