package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of (point-in-time) join — the finance-native operator pandas
  * calls `merge_asof` and DuckDB spells `ASOF JOIN`. Spark has no
  * built-in (SURVEY.md §2.3); the scalable formulation used here is
  * union + ordered window rather than a range join:
  *
  *   1. tag left rows (1) and right rows (0) and union them on the
  *      shared (partition keys, timestamp) shape;
  *   2. one shuffle+sort per partition key orders the merged stream —
  *      right rows sort before left rows at equal timestamps, giving
  *      inclusive as-of semantics in both directions;
  *   3. `last(right_payload, ignoreNulls)` over the preceding frame
  *      carries the nearest matching right row forward;
  *   4. keep the left rows.
  *
  * Cost at scale: ONE shuffle of |L| + |R| rows on the partition key
  * and one sort — the same price as a sort-merge join, with no range
  * explosion and no skew beyond what the key distribution itself has.
  * A range join (`l.ts BETWEEN r.ts AND r.ts + tol`) would fan out
  * quadratically on dense keys; the window formulation cannot.
  *
  * Determinism: callers should ensure right rows are unique per
  * (keys, rightTs) — pre-aggregate ties (e.g. keep max id) — otherwise
  * the carried payload among equal timestamps is tie-broken by
  * `tieBreak` if given (HIGHEST wins, both directions), else
  * unspecified.
  */
object AsOfJoin {

  /** Backward as-of join (the common direction): for every left row,
    * attach the latest right row with `right.tsCol <= left.tsCol`
    * within the same partition keys; nulls where none exists.
    *
    * @param left       left (probe) side; all its columns survive
    * @param right      right (reference) side
    * @param keys       equi-join partition columns (present both sides)
    * @param leftTs     left event-time column name
    * @param rightTs    right event-time column name
    * @param payload    right columns to attach (must include rightTs if
    *                   `toleranceMicros` is set)
    * @param tieBreak   optional right column ordering ties at equal
    *                   (keys, rightTs) — highest wins
    * @param toleranceMicros optional max age: matches older than this
    *                   many microseconds (leftTs − rightTs) are nulled
    */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String],
      tieBreak: Option[String] = None,
      toleranceMicros: Option[Long] = None): DataFrame =
    asOf(left, right, keys, leftTs, rightTs, payload, tieBreak,
      toleranceMicros, forwardDir = false)

  /** Forward as-of join: earliest right row with
    * `right.tsCol >= left.tsCol`. Mirror of `backward` — descending
    * scan order, same single-shuffle cost, same highest-wins
    * tie-break. */
  def forward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String],
      tieBreak: Option[String] = None,
      toleranceMicros: Option[Long] = None): DataFrame =
    asOf(left, right, keys, leftTs, rightTs, payload, tieBreak,
      toleranceMicros, forwardDir = true)

  private def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String],
      tieBreak: Option[String], toleranceMicros: Option[Long],
      forwardDir: Boolean): DataFrame = {
    require(payload.nonEmpty, "payload must name at least one right column")
    toleranceMicros.foreach(_ => require(payload.contains(rightTs),
      "toleranceMicros requires rightTs in payload"))

    val leftStruct = struct(left.columns.map(col).toIndexedSeq: _*)
    val rightStruct = struct(payload.map(col).toIndexedSeq: _*)
    val lSchema = StructType(left.schema.fields)
    val rSchema = StructType(right.select(payload.map(col): _*).schema.fields)

    val tb = tieBreak.map(col).getOrElse(lit(null))
    val l = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).as("__ts"), lit(1).as("__tag"), lit(null).as("__tb"),
        leftStruct.as("__l"), lit(null).cast(rSchema).as("__r")): _*)
    val r = right.select(
        keys.map(col) ++ Seq(
          col(rightTs).as("__ts"), lit(0).as("__tag"), tb.as("__tb"),
          lit(null).cast(lSchema).as("__l"), rightStruct.as("__r")): _*)
      // a right row with a null timestamp has no temporal position:
      // under the scan order it would sort at the nulls-first boundary
      // and become a spurious fallback match for every early left row
      .filter(col("__ts").isNotNull)

    // Scan order: ascending time for backward (latest at-or-before),
    // descending for forward (earliest at-or-after). Either way, right
    // rows (tag 0) sort before left rows at equal timestamps (inclusive
    // match) and tieBreak ascending puts the HIGHEST nearest `current`,
    // so `last()` picks it.
    val tsOrder = if (forwardDir) col("__ts").desc else col("__ts").asc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(tsOrder, col("__tag").asc, col("__tb").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matchedRaw = last(col("__r"), ignoreNulls = true).over(w)
    val matched = toleranceMicros match {
      case Some(tol) =>
        val age =
          if (forwardDir)
            unix_micros(matchedRaw.getField(rightTs)) - unix_micros(col("__ts"))
          else
            unix_micros(col("__ts")) - unix_micros(matchedRaw.getField(rightTs))
        when(age <= tol, matchedRaw)
      case None => matchedRaw
    }

    // a LEFT row with a null timestamp is emitted (left-preserving)
    // but can match nothing — without the override it sorts at a scan
    // boundary and silently picks up the min/max-ts right row
    val matchedSafe =
      when(col("__ts").isNull, lit(null).cast(rSchema)).otherwise(matched)
    l.unionByName(r)
      .select(col("__tag"), col("__l"), matchedSafe.as("__m"))
      .filter(col("__tag") === 1)
      .select(
        left.columns.map(c => col(s"__l.$c").as(c)).toIndexedSeq ++
          payload.map(c => col(s"__m.$c").as(s"asof_$c")): _*)
  }
}
