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
  *  - TABLE rules (key uniqueness, referential integrity): uniqueness
  *    folds into the same single agg via
  *    `count - count(distinct struct(keys))` (Expand, still one job);
  *    each foreign-key check rides the SAME scan as a broadcast
  *    left-outer join against the dimension's distinct keys plus a
  *    flag-sum in the shared aggregate (r11 — the previous per-FK
  *    left-anti counts re-scanned the fact once per key). k rules +
  *    m foreign keys = ONE pass over the fact, always.
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

  /** Every check contributes one column to the shared aggregate named
    * after its rule; a collision (e.g. an FK check named like a row
    * rule) would otherwise surface as an opaque ambiguous-column
    * AnalysisException deep in the post-agg select — fail fast with
    * the offending name instead. */
  private def requireDistinctNames(names: Seq[String]): Unit = {
    val dups = names.diff(names.distinct).distinct
    require(dups.isEmpty, "duplicate check names across row rules, " +
      s"uniqueness and foreign keys: ${dups.mkString(", ")}")
  }

  /** Fold the foreign-key checks into the SAME single scan as the row
    * rules: each FK becomes one broadcast LEFT OUTER join against the
    * DISTINCT dimension keys (distinct ⇒ the join preserves row
    * multiplicity exactly, so every other aggregate is unaffected)
    * plus a `sum(child not null ∧ ref null)` column in the shared
    * aggregate — identical count to the left-anti form it replaces,
    * but k FK checks now cost ZERO extra scans of the fact where the
    * anti-join form re-scanned it once per key. Returns the joined
    * frame, the FK aggregate columns, and their rule names. */
  private def fkFold(df: DataFrame,
      foreignKeys: Map[String, (String, DataFrame, String)])
      : (DataFrame, Seq[Column], Seq[String]) = {
    val fks = foreignKeys.toSeq.sortBy(_._1).zipWithIndex
    fks.foreach { case ((name, (childCol, _, _)), i) =>
      require(!df.columns.contains(s"__fk_ref_$i"),
        s"input already has column __fk_ref_$i reserved by check ($name)")
      require(df.columns.contains(childCol),
        s"foreign key $name: no column '$childCol' in the checked frame")
    }
    val joined = fks.foldLeft(df) { case (acc, ((_, (childCol, dim, dimCol)), i)) =>
      acc.join(broadcast(dim.select(col(dimCol).as(s"__fk_ref_$i")).distinct()),
        col(childCol) === col(s"__fk_ref_$i"), "left_outer")
    }
    val cols = fks.map { case ((name, (childCol, _, _)), i) =>
      sum(when(col(childCol).isNotNull && col(s"__fk_ref_$i").isNull,
        1L).otherwise(0L)).as(name)
    }
    (joined, cols, fks.map(_._1._1))
  }

  /** [[check]] as a DataFrame: one (rule, violations) row per rule —
    * the distributable/report shape (write it, join it, gate on it
    * without a driver collect). Row rules and ALL foreign-key checks
    * fold into ONE partial+final aggregate over ONE scan of the fact:
    * the FK flags ride the same pass as broadcast left-outer joins
    * ([[fkFold]]; pre-r11 each FK re-scanned the fact for its own
    * anti-join count). The key-UNIQUENESS check runs as its OWN
    * aggregate branch over a keys-only projection, cross-joined back
    * (two 1-row frames) — r15 re-plan: folding count_distinct into
    * the shared aggregate makes Spark's single-distinct rewrite group
    * the whole joined frame BY THE UNIQUE KEY, dragging every row
    * rule's partial sums through a |rows|-group exchange (measured
    * 1.5 s at sf0.1 vs 0.25 s for the row rules alone); the split
    * branch exchanges only the 8-byte-per-row key projection, its
    * parquet scan prunes to the key columns, and AQE schedules the
    * two branches concurrently (1.5 → 0.9 s). On a columnar source
    * the second scan reads bytes the first never touched. The long
    * format is an explode of the joined result row. Distribution
    * (quantile-sketch) rules stay on [[check]] — their readout is
    * engine-specific sketch state, not an exact count. Declared under
    * the DuckDB oracle as `q_expectations`. */
  def checkFrame(df: DataFrame, rules: Seq[Rule],
      uniqueKey: Seq[String] = Nil,
      foreignKeys: Map[String, (String, DataFrame, String)] = Map.empty)
      : DataFrame = {
    val rowRules = rules.filter(_.rowPredicate.isDefined)
    require(rowRules.nonEmpty || uniqueKey.nonEmpty || foreignKeys.nonEmpty,
      "checkFrame needs at least one rule")
    val (rowCols, rowNames) = rowAggCols(rowRules, Nil)
    val (joined, fkCols, fkNames) = fkFold(df, foreignKeys)
    val uniqName =
      if (uniqueKey.nonEmpty) Seq(s"unique(${uniqueKey.mkString(",")})")
      else Nil
    val names = rowNames ++ fkNames ++ uniqName
    requireDistinctNames(names)
    val aggCols = rowCols ++ fkCols
    val scanAgg =
      if (aggCols.nonEmpty) Some(joined.agg(aggCols.head, aggCols.tail: _*))
      else None
    val uniqAgg =
      if (uniqueKey.nonEmpty)
        Some(df.select(uniqueKey.map(col): _*)
          .agg((count(lit(1)) - count_distinct(struct(uniqueKey.map(col): _*)))
            .as(uniqName.head)))
      else None
    val one = (scanAgg, uniqAgg) match {
      case (Some(a), Some(b)) => a.crossJoin(b)
      case (Some(a), None) => a
      case (None, Some(b)) => b
      case (None, None) => throw new IllegalStateException("unreachable")
    }
    one
      // coalesce: sum() over ZERO rows is null — an empty batch must
      // report 0 violations per rule (vacuous pass, matching check()'s
      // driver-side null handling), not a null-violations report row
      .select(explode(array(names.map(n =>
          struct(lit(n).as("rule"),
            coalesce(quoted(n).cast("long"), lit(0L)).as("violations"))): _*))
        .as("__r"))
      .select(col("__r.*"))
  }

  /** Evaluate row rules, key-uniqueness, ALL foreign-key checks and
    * the quantile sketches in ONE aggregate job over one scan
    * ([[fkFold]] rides the FK flags on broadcast left-outer joins).
    * `foreignKeys` maps "fk(child->dim)" style names to
    * (childCol, dimFrame, dimCol). */
  def check(df: DataFrame, rules: Seq[Rule],
      uniqueKey: Seq[String] = Nil,
      foreignKeys: Map[String, (String, DataFrame, String)] = Map.empty,
      distributions: Seq[QuantileRule] = Nil)
      : Seq[Violation] = {
    val rowRules = rules.filter(_.rowPredicate.isDefined)
    val (rowCols0, countNames0) = rowAggCols(rowRules, uniqueKey)
    val (joined, fkCols, fkNames) = fkFold(df, foreignKeys)
    val rowCols = rowCols0 ++ fkCols
    val countNames = countNames0 ++ fkNames
    // the distribution sketches join the same aggregate under
    // __kll_-prefixed columns — a rule literally named "__kll_<x>"
    // next to a distribution named "<x>" (or two same-named
    // distributions) is the same ambiguous-column class as the
    // row-rule/FK collision, so check them all together
    requireDistinctNames(countNames ++
      distributions.map(d => s"__kll_${d.name}"))
    val aggCols = rowCols ++
      // the sketch joins the same single aggregate; the quantile
      // readout happens in the select over its one-row result
      distributions.map(d =>
        kll_sketch_agg_double(col(d.column).cast("double"), 200)
          .as(s"__kll_${d.name}"))
    val base: Seq[Violation] =
      if (aggCols.isEmpty) Nil
      else {
        val agged = joined.agg(aggCols.head, aggCols.tail: _*)
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
    base
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
