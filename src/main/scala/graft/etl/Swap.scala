package graft.etl

import org.apache.hadoop.fs.{FileSystem, Path}

/** Swap-publish for directory-valued state (compacted layouts,
  * incremental-agg state, CDC snapshots): write the next version to a
  * tmp dir, then delete→rename over the live one.
  *
  * The delete→rename gap is the pattern's one crash window — after it,
  * the data exists only under the tmp name. [[recover]] closes it:
  * callers invoke it before READING the live dir, promoting a complete
  * (_SUCCESS-marked) orphan tmp when the live dir is missing. Combined
  * with version-guarded merges (ChangeApply) or checkpoint replays
  * (foreachBatch sinks), a crash at any instant loses no state.
  * Readers can still race the gap on object stores — the documented
  * limit of table-format-free publishing (see `Layout.compact`).
  */
private[graft] object Swap {

  /** Promote an interrupted publish: live dir missing + complete tmp
    * present → rename tmp into place. Returns true if it recovered. */
  def recover(fs: FileSystem, live: Path, tmp: Path): Boolean =
    if (!fs.exists(live) && fs.exists(new Path(tmp, "_SUCCESS"))) {
      require(fs.rename(tmp, live), s"swap recovery failed for $live")
      true
    } else false

  /** Publish `tmp` over `live` (delete→rename). `tmp` must be fully
    * written (parquet writes leave _SUCCESS). */
  def publish(fs: FileSystem, live: Path, tmp: Path): Unit = {
    fs.delete(live, true)
    require(fs.rename(tmp, live), s"swap publish failed for $live")
  }

  // -- applied-batch markers: replay protection for NON-idempotent
  // -- folds driven by at-least-once feeds. A marker rides INSIDE the
  // -- swapped state dir (underscore files are invisible to parquet
  // -- readers), so the atomic rename publishes fold + marker together
  // -- and "folded" vs "marked" can never diverge.

  /** Marker file name for one (runTag, batchId). */
  def markerName(runTag: String, batchId: Long): String =
    s"_applied_${runTag}_$batchId"

  /** Has this (runTag, batchId) already been folded into `live`? */
  def markerExists(fs: FileSystem, live: Path, runTag: String,
      batchId: Long): Boolean =
    fs.exists(new Path(live, markerName(runTag, batchId)))

  /** Carry every existing marker from `live` into `tmp` and add the
    * new one — call after writing `tmp`, before [[publish]]. */
  def carryMarkers(fs: FileSystem, live: Path, tmp: Path,
      newMarker: Option[String]): Unit = {
    if (fs.exists(live))
      fs.listStatus(live).iterator
        .filter(_.getPath.getName.startsWith("_applied_"))
        .foreach(m => fs.create(new Path(tmp, m.getPath.getName), true).close())
    newMarker.foreach(m => fs.create(new Path(tmp, m), true).close())
  }
}
