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

  /** Distribution expectation: the `prob`-quantile of `column` must
    * lie in [lo, hi] — the drift gate row rules can't express (every
    * row can be individually in range while the distribution walks
    * off). Costed like the row rules: the KLL sketch rides the SAME
    * single aggregate (mergeable state, map-side combined), and the
    * quantile readout is a scalar expression over the one-row result
    * — no second scan, no extra exchange. Estimate error follows the
    * sketch (k=200 ≈ 1.65% rank error): bounds should carry margin,
    * this is a drift gate, not an exact assertion. */
  final case class QuantileRule(name: String, column: String,
      prob: Double, lo: Double, hi: Double)

  def quantileBetween(c: String, prob: Double, lo: Double,
      hi: Double): QuantileRule = {
    require(prob > 0.0 && prob < 1.0, s"prob must be in (0,1), got $prob")
    QuantileRule(s"quantile($c,$prob)", c, prob, lo, hi)
  }

  final case class Violation(rule: String, violations: Long) {
    def passed: Boolean = violations == 0L
  }

  /** The row-rule + uniqueness aggregate columns and their result
    * names — ONE definition shared by [[check]] and [[checkFrame]] so
    * the two report shapes cannot drift. A predicate evaluating to
    * NULL (three-valued logic on null inputs) is NOT a pass —
    * coalesce to false before negating. */
  private def rowAggCols(rowRules: Seq[Rule],
      uniqueKey: Seq[String]): (Seq[Column], Seq[String]) = {
    val cols =
      rowRules.map(r => sum(when(coalesce(r.rowPredicate.get, lit(false)),
        0L).otherwise(1L)).as(r.name)) ++
      (if (uniqueKey.nonEmpty)
        Seq((count(lit(1)) - count_distinct(struct(uniqueKey.map(col): _*)))
          .as(s"unique(${uniqueKey.mkString(",")})"))
      else Nil)
    val names = rowRules.map(_.name) ++
      (if (uniqueKey.nonEmpty)
        Seq(s"unique(${uniqueKey.mkString(",")})") else Nil)
    (cols, names)
  }

  private def quoted(n: String): Column = col(s"`${n.replace("`", "``")}`")

  /** [[check]] as a DataFrame: one (rule, violations) row per rule —
    * the distributable/report shape (write it, join it, gate on it
    * without a driver collect). Row rules + uniqueness still fold
    * into ONE partial+final aggregate over one scan (the long format
    * is an explode of that single result row); each foreign key adds
    * its one broadcast anti-join count. Distribution (quantile-sketch)
    * rules stay on [[check]] — their readout is engine-specific
    * sketch state, not an exact count. Declared under the DuckDB
    * oracle as `q_expectations`. */
  def checkFrame(df: DataFrame, rules: Seq[Rule],
      uniqueKey: Seq[String] = Nil,
      foreignKeys: Map[String, (String, DataFrame, String)] = Map.empty)
      : DataFrame = {
    val rowRules = rules.filter(_.rowPredicate.isDefined)
    require(rowRules.nonEmpty || uniqueKey.nonEmpty || foreignKeys.nonEmpty,
      "checkFrame needs at least one rule")
    val (aggCols, names) = rowAggCols(rowRules, uniqueKey)
    val parts =
      (if (aggCols.isEmpty) Nil
      else Seq(df.agg(aggCols.head, aggCols.tail: _*)
        .select(explode(array(names.map(n =>
            struct(lit(n).as("rule"),
              quoted(n).cast("long").as("violations"))): _*)).as("__r"))
        .select(col("__r.*")))) ++
      foreignKeys.toSeq.sortBy(_._1).map { case (name, (childCol, dim, dimCol)) =>
        df.filter(col(childCol).isNotNull)
          .join(broadcast(dim.select(col(dimCol).as("__fk_ref")).distinct()),
            col(childCol) === col("__fk_ref"), "left_anti")
          .agg(count(lit(1)).as("violations"))
          .select(lit(name).as("rule"), col("violations"))
      }
    parts.reduce(_ unionByName _)
  }

  /** Evaluate row rules + optional key-uniqueness in ONE aggregate
    * job, then one anti-join count per foreign-key check.
    * `foreignKeys` maps "fk(child->dim)" style names to
    * (childCol, dimFrame, dimCol). */
  def check(df: DataFrame, rules: Seq[Rule],
      uniqueKey: Seq[String] = Nil,
      foreignKeys: Map[String, (String, DataFrame, String)] = Map.empty,
      distributions: Seq[QuantileRule] = Nil)
      : Seq[Violation] = {
    val rowRules = rules.filter(_.rowPredicate.isDefined)
    val (rowCols, countNames) = rowAggCols(rowRules, uniqueKey)
    val aggCols = rowCols ++
      // the sketch joins the same single aggregate; the quantile
      // readout happens in the select over its one-row result
      distributions.map(d =>
        kll_sketch_agg_double(col(d.column).cast("double"), 200)
          .as(s"__kll_${d.name}"))
    val base: Seq[Violation] =
      if (aggCols.isEmpty) Nil
      else {
        val agged = df.agg(aggCols.head, aggCols.tail: _*)
        val row = agged.select(
          countNames.map(quoted) ++
          distributions.map { d =>
            val sk = col(s"`__kll_${d.name.replace("`", "``")}`")
            val q = kll_sketch_get_quantile_double(sk, lit(d.prob))
            // an EMPTY sketch (zero-row frame / all-null column) has no
            // quantiles — reading one throws, so gate on the item count
            // first. Empty input = vacuously satisfied, matching row
            // rules which count 0 violations there: a legitimately
            // empty partition must not fail one rule kind and pass the
            // other
            when(sk.isNull || kll_sketch_get_n_double(sk) === 0, 0L)
              .when(q >= d.lo && q <= d.hi, 0L).otherwise(1L).as(d.name)
          }: _*).head()
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
