package graft.serve

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Serving path over the published star schema — SURVEY §3 E3.
  *
  * The reference dashboard (streamlit/app.py:90) loads the ENTIRE fact
  * table with `SELECT * … ORDER BY DateKey`, then filters client-side
  * in pandas (:106-110) — a full materialize + full sort per page view,
  * repeated for every user interaction. This module is the Spark-first
  * correction:
  *
  *  - star frames are loaded once and cached (`serve-layer` memory —
  *    the dims are KB-sized, the fact fits serving memory by
  *    construction of the serving tier; `release()` drops the pins);
  *  - every accessor FILTERS FIRST and sorts only the slice: the
  *    filter is part of the Catalyst plan, so it executes below the
  *    sort (ServeSpec gates the plan shape), and a top-k request plans
  *    as TakeOrderedAndProject, never a full sort;
  *  - dim lookups (`indexKeyFor`) collect a KB-sized dimension — the
  *    reference does the same `dict(zip(...))` (:97-99).
  */
class StarServe(spark: SparkSession, starDir: String,
    factSnapshotDir: Option[String] = None) {

  // The fact source is either the static star parquet (batch publish)
  // or — snapshot mode — whatever snapshot the streaming upsert sink's
  // `_LATEST` pointer names, closing the reference's daily-batch →
  // dashboard loop with the incremental pipeline instead. Cached
  // either way; in snapshot mode `refresh()` polls the pointer (one
  // metadata read) and swaps the cache pin only when it moved.
  @volatile private var factPtr: Option[String] =
    factSnapshotDir.flatMap(d =>
      graft.streaming.StreamingPipeline.latestSnapshotName(spark, d))
  private var factCache: Option[DataFrame] = None

  private def loadFact(): DataFrame = (factSnapshotDir match {
    case Some(d) =>
      // record the pointer ACTUALLY loaded: without this, a snapshot
      // published between construction and the first fact() call makes
      // the next refresh() see a "moved" pointer and drop a cache that
      // already holds the new data. (A flip between these two reads is
      // benign — refresh() just reloads once.)
      factPtr = graft.streaming.StreamingPipeline.latestSnapshotName(spark, d)
      graft.streaming.StreamingPipeline.readLatestSnapshot(spark, d)
    case None => spark.read.parquet(s"$starDir/fact_table.parquet")
  }).cache()

  /** Cached fact frame (reference reads the same objects,
    * app.py:75-95). */
  def fact: DataFrame = synchronized {
    factCache.getOrElse { val f = loadFact(); factCache = Some(f); f }
  }

  /** Snapshot mode: re-read the `_LATEST` pointer; when it names a new
    * snapshot, drop the cache pin so the next accessor call loads and
    * caches the new one. Returns true when a swap happened. Static
    * mode (no snapshot dir) always returns false — the star parquet is
    * immutable by the publish contract. */
  def refresh(): Boolean = synchronized {
    factSnapshotDir match {
      case None => false
      case Some(d) =>
        val p = graft.streaming.StreamingPipeline.latestSnapshotName(spark, d)
        if (p == factPtr) false
        else {
          factCache.foreach(_.unpersist())
          factCache = None
          factPtr = p
          true
        }
    }
  }

  /** Cached star dimension frames. */
  lazy val dimStockIndex: DataFrame =
    spark.read.parquet(s"$starDir/dim_stock_index.parquet").cache()
  lazy val dimDate: DataFrame =
    spark.read.parquet(s"$starDir/dim_date.parquet").cache()
  lazy val dimCountry: DataFrame =
    spark.read.parquet(s"$starDir/dim_country.parquet").cache()

  /** IndexCode → IndexKey, the sidebar mapping (app.py:97-99). */
  def indexKeyFor(indexCode: String): Option[String] =
    dimStockIndex.filter(col("IndexCode") === indexCode)
      .select(col("IndexKey")).collect().headOption.map(_.getString(0))

  /** Date bounds for the range picker (app.py:101-103) — an aggregate,
    * not a client-side scan. */
  def factDateBounds(): (java.sql.Date, java.sql.Date) = {
    val r = fact.agg(min(col("DateKey")), max(col("DateKey"))).head
    (r.getDate(0), r.getDate(1))
  }

  /** The Charts slice (app.py:106-110), filter-before-sort: index +
    * date-range predicates are Catalyst filters below the sort. */
  def factSlice(indexCode: String, start: String, end: String): DataFrame =
    fact
      .join(broadcast(dimStockIndex.filter(col("IndexCode") === indexCode)
        .select(col("IndexKey"))), Seq("IndexKey"))
      .filter(col("DateKey") >= lit(start).cast("date") &&
        col("DateKey") <= lit(end).cast("date"))
      .orderBy(col("DateKey"))

  /** The chart's two series (app.py:118-127). */
  def chartSeries(indexCode: String, start: String, end: String): DataFrame =
    factSlice(indexCode, start, end)
      .select(col("DateKey"), col("Close"), col("GDPGrowthRate"))

  /** The rendered dual-axis chart (app.py:114-130): the chartSeries
    * slice — already filtered and ordered in the Catalyst plan —
    * collected and drawn as deterministic SVG. The collect is the
    * serving-tier materialization the reference's `st.pyplot` does on
    * the same KB-sized slice; an empty slice renders the reference's
    * warning banner (app.py:131).
    *
    * `maxRows` enforces the serving-tier size contract in the SAME
    * single execution that renders: the collect is limit-bounded at
    * maxRows+1, and an over-cap slice throws [[StarServe.SliceTooLarge]]
    * BEFORE materializing it (the HTTP facade maps this to 413). A
    * probe-then-render pair would both run the query twice and race a
    * concurrent snapshot refresh between check and use. */
  def chartSvg(indexCode: String, start: String, end: String,
      maxRows: Int = Int.MaxValue): String = {
    val name = dimStockIndex.filter(col("IndexCode") === indexCode)
      .select(col("IndexName")).collect().headOption
      .map(_.getString(0)).getOrElse(indexCode)
    val collected =
      if (maxRows == Int.MaxValue) chartSeries(indexCode, start, end).collect()
      else chartSeries(indexCode, start, end).limit(maxRows + 1).collect()
    if (collected.length > maxRows)
      throw new StarServe.SliceTooLarge(
        s"slice exceeds $maxRows rows; narrow the date range")
    val rows = collected.toSeq.map { r =>
      (r.getDate(0).toLocalDate.toEpochDay,
        if (r.isNullAt(1)) None else Some(r.getDouble(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))
    }
    ChartRender.dualAxis(s"Close Price and GDP Growth - $name", rows)
  }

  /** Latest-k rows for a table widget: top-k plan
    * (TakeOrderedAndProject), never a full sort. */
  def latest(indexCode: String, k: Int): DataFrame =
    fact
      .join(broadcast(dimStockIndex.filter(col("IndexCode") === indexCode)
        .select(col("IndexKey"))), Seq("IndexKey"))
      .orderBy(col("DateKey").desc)
      .limit(k)

  /** Release the serve-layer cache pins. */
  def release(): Unit = synchronized {
    factCache.foreach(_.unpersist())
    factCache = None
    Seq(dimStockIndex, dimDate, dimCountry).foreach(_.unpersist())
  }
}

object StarServe {
  /** Serve dims from the published star, and the fact from a streaming
    * upsert snapshot directory (`StreamingPipeline.upsertSink` output):
    * the serving tier tracks the incremental pipeline via `refresh()`
    * instead of waiting for the next full star publish. */
  def fromStreamingSnapshots(spark: SparkSession, starDir: String,
      snapshotDir: String): StarServe =
    new StarServe(spark, starDir, Some(snapshotDir))

  /** A requested slice exceeds the serving-tier row cap — thrown
    * before the oversized slice is materialized; the HTTP facade maps
    * it to 413 Content Too Large. */
  final class SliceTooLarge(msg: String) extends RuntimeException(msg)
}
