package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations over an ingest batch — the
  * contract gate between landing and star-build that a production
  * pipeline runs on every load (the public pattern is Deequ/dbt
  * tests: metrics as aggregates, not row loops).
  *
  * Two rule classes, costed differently on purpose:
  *  - ROW rules (not-null, range, regex, custom predicate) compile to
  *    `sum(when(!cond, 1))` columns — ALL of them evaluate in ONE
  *    partial+final aggregate over one scan, O(rows) with a
  *    single-row result; the same predicates drive [[split]] to
  *    quarantine offending rows without recomputing anything.
  *  - TABLE rules (key uniqueness, referential integrity) need their
  *    own shuffle by nature: uniqueness folds into the same single
  *    agg via `count - count(distinct struct(keys))` (Expand, still
  *    one job); each foreign-key check is a left-anti count against
  *    its dimension — broadcast when the dim is small, which is the
  *    star-schema case.
  *
  * ExpectationsSpec pins the violation counts, the quarantine split,
  * and the one-Exchange plan shape of the row-rule pass.
  */
object Expectations {

  /** A named expectation; `rowPredicate` is Some(cond that GOOD rows
    * satisfy) for row-level rules, None for table-level ones. */
  final case class Rule(name: String, rowPredicate: Option[Column])

  def notNull(c: String): Rule =
    Rule(s"not_null($c)", Some(col(c).isNotNull))

  def inRange(c: String, lo: Double, hi: Double): Rule =
    Rule(s"in_range($c)",
      Some(col(c).isNotNull && col(c) >= lo && col(c) <= hi))

  def matches(c: String, regex: String): Rule =
    Rule(s"matches($c)", Some(col(c).isNotNull && col(c).rlike(regex)))

  /** Arbitrary row predicate (good rows satisfy `cond`). */
  def satisfies(name: String, cond: Column): Rule = Rule(name, Some(cond))

  final case class Violation(rule: String, violations: Long) {
    def passed: Boolean = violations == 0L
  }

  /** Evaluate row rules + optional key-uniqueness in ONE aggregate
    * job, then one anti-join count per foreign-key check.
    * `foreignKeys` maps "fk(child->dim)" style names to
    * (childCol, dimFrame, dimCol). */
  def check(df: DataFrame, rules: Seq[Rule],
      uniqueKey: Seq[String] = Nil,
      foreignKeys: Map[String, (String, DataFrame, String)] = Map.empty)
      : Seq[Violation] = {
    val rowRules = rules.filter(_.rowPredicate.isDefined)
    // a predicate evaluating to NULL (three-valued logic on null
    // inputs) is NOT a pass — coalesce to false before negating
    val aggCols =
      rowRules.map(r => sum(when(coalesce(r.rowPredicate.get, lit(false)),
        0L).otherwise(1L)).as(r.name)) ++
      (if (uniqueKey.nonEmpty)
        Seq((count(lit(1)) - count_distinct(struct(uniqueKey.map(col): _*)))
          .as(s"unique(${uniqueKey.mkString(",")})"))
      else Nil)
    val base: Seq[Violation] =
      if (aggCols.isEmpty) Nil
      else {
        val row = df.agg(aggCols.head, aggCols.tail: _*).head()
        row.schema.fieldNames.zipWithIndex.map { case (n, i) =>
          Violation(n, if (row.isNullAt(i)) 0L else row.getLong(i))
        }.toSeq
      }
    val fks = foreignKeys.map { case (name, (childCol, dim, dimCol)) =>
      // alias the dim side: child and dim key columns usually share a
      // name in a star schema, which would make the raw join ambiguous
      Violation(name, df.filter(col(childCol).isNotNull)
        .join(broadcast(dim.select(col(dimCol).as("__fk_ref")).distinct()),
          col(childCol) === col("__fk_ref"), "left_anti").count())
    }
    base ++ fks
  }

  /** Split on the row rules: (rows passing ALL, rows failing ANY with
    * a `__failed` column naming the rules they broke). Same predicates
    * as [[check]] — a row counted there is quarantined here. */
  def split(df: DataFrame, rules: Seq[Rule]): (DataFrame, DataFrame) = {
    val rowRules = rules.filter(_.rowPredicate.isDefined)
    require(rowRules.nonEmpty, "split needs at least one row-level rule")
    val failed = array(rowRules.map(r =>
      when(!coalesce(r.rowPredicate.get, lit(false)), lit(r.name))): _*)
    val withFlags = df.withColumn("__failed", filter(failed, _.isNotNull))
    (withFlags.filter(size(col("__failed")) === 0).drop("__failed"),
      withFlags.filter(size(col("__failed")) > 0))
  }
}
