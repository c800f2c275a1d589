package graft.streaming

import org.apache.spark.sql.SparkSession

/** State-store backend selection for the stateful streaming operators
  * (dedup, session windows, sessionize, funnel, stream-stream joins).
  *
  * The default HDFS-backed provider keeps every key's state as JVM
  * heap objects — at 100 TB/∞-time scale (billions of live dedup keys
  * per executor between watermark evictions) that is an OOM, not a
  * tuning problem. RocksDB keeps state off-heap on local SSD with a
  * block-cache budget, so live state is bounded by disk, and
  * changelog checkpointing uploads only each micro-batch's DELTA to
  * the checkpoint store instead of re-snapshotting every SST file —
  * the difference between O(|batch|) and O(|state|) per-batch
  * checkpoint IO on a large keyspace.
  *
  * Session-level because the provider is read from the session conf at
  * query START; set it before `writeStream.start()`. Existing
  * checkpoints pin their provider — switching backends needs a fresh
  * checkpoint dir (Spark refuses the mismatch rather than corrupting
  * state).
  */
object StateBackend {

  val RocksDBProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private val keys = Seq(
    "spark.sql.streaming.stateStore.providerClass",
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
    "spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage",
    "spark.sql.streaming.stateStore.rocksdb.maxMemoryUsageMB")

  /** Point every subsequently-started streaming query at RocksDB
    * state with one shared `memoryBudgetMB` block-cache+memtable
    * budget across all state-store instances on the executor (without
    * it, each of shufflePartitions × stateful-operators instances
    * sizes its own cache independently — unbounded in aggregate).
    * Returns the prior conf values for [[restore]]. */
  def useRocksDB(spark: SparkSession, memoryBudgetMB: Int = 512): Map[String, Option[String]] = {
    val prior = keys.map(k => k -> spark.conf.getOption(k)).toMap
    spark.conf.set(keys(0), RocksDBProvider)
    spark.conf.set(keys(1), "true")
    spark.conf.set(keys(2), "true")
    spark.conf.set(keys(3), memoryBudgetMB.toString)
    prior
  }

  /** Restore conf captured by [[useRocksDB]] — for tests and mixed
    * deployments where only some queries want RocksDB. */
  def restore(spark: SparkSession, prior: Map[String, Option[String]]): Unit =
    prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
}
