package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Physical-layout helpers: the two techniques that delete shuffles
  * and scans at 100 TB rather than merely speeding them up.
  *
  *  - **Bucketing**: write both sides of a recurring equi-join
  *    pre-hash-partitioned on the join key (`bucketBy`). Joins on the
  *    bucket key then plan WITHOUT an Exchange on either side — the
  *    shuffle happened once at write time and is amortized over every
  *    subsequent join (the fact⋈orders shape of the reference's star
  *    schema, done right at scale).
  *  - **Partitioned layout**: write with `partitionBy(date-derived
  *    column)` so the reference's filename-date watermark (SURVEY
  *    §2.1 S7) becomes partition pruning — a date filter scans only
  *    matching directories (`PartitionFilters` in the plan), the
  *    engine-native form of the incremental-load predicate.
  *
  * LayoutSpec asserts both plan effects (no Exchange under the
  * bucketed join; PartitionFilters on the pruned scan).
  */
object Layout {

  /** Write `df` as a bucketed, sorted table on `key` (managed table —
    * bucketing metadata lives in the catalog). */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key — plans with
    * zero Exchange when bucket counts match. */
  def bucketedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)

  /** Write a date-partitioned layout: `partitionCol` must be a
    * low-cardinality derived column (e.g. `to_date(ts)`). */
  def writePartitioned(df: DataFrame, path: String,
      partitionCol: String): Unit =
    df.write
      .partitionBy(partitionCol)
      .mode("overwrite")
      .parquet(path)
}
