package graft.etl

import java.time.LocalDate

import org.apache.spark.sql.DataFrame

/** Landing-zone CSV sink — SURVEY §2.1 S8.
  *
  * The reference appends one CSV object per fetch day to the landing
  * bucket (`{prefix}:{today}.csv`, fetch_stocks.py:72-78 for stocks,
  * :113-119 for world-bank). The engine convention is
  * `{prefix}_{date}.csv` (':' is path-illegal on Hadoop, see
  * StarSchemaBuilder.lastSavedDate), written as a Spark CSV directory —
  * object-store friendly (no client-side temp file + manual upload) and
  * transparently matched by both landing consumers:
  * `readLanding`'s `{prefix}_*.csv` glob and `lastSavedDate`'s
  * name-based watermark both treat the directory as the day's object.
  *
  * NOTE for consumers OUTSIDE this repo: `{prefix}_{date}.csv` is a
  * DIRECTORY holding `part-*.csv` + `_SUCCESS`, not a single object —
  * any Spark/Hive/DuckDB reader handles it transparently, but a plain
  * S3 GET of the `.csv` key will not. If a downstream system needs the
  * single-object layout, rename `part-*` over the directory with the
  * Hadoop FS API after the write (cheap: one object per day).
  *
  * Scale note: a daily increment is small by construction (one day of
  * rows), so `coalesce(1)` writes the single object the reference
  * writes without a shuffle; the full history remains many objects,
  * listed and scanned in parallel.
  */
object Landing {

  /** Append one day's rows as `{landingDir}/{prefix}_{date}.csv`
    * (header included, matching the reference's `to_csv`). Overwrite
    * mode makes a retried day idempotent — the reference's
    * `put_object` has the same last-write-wins behavior. Returns the
    * written path. */
  def appendDay(df: DataFrame, landingDir: String, prefix: String,
      date: LocalDate): String = {
    val target = s"$landingDir/${prefix}_$date.csv"
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(target)
    target
  }
}
