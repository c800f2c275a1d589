package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.Expectations
import graft.etl.Expectations._

/** graft.etl.Expectations — violation counts must be exact, the
  * quarantine split must agree with them, NULL predicate results must
  * count as violations, and the row-rule pass must stay one job. */
class ExpectationsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private lazy val dirty = Seq(
    (1L, "alice@x.io", 10.0, "AA"),
    (2L, null, 20.0, "BB"),        // null email
    (3L, "bob@y.org", -5.0, "AA"), // range violation
    (4L, "not-an-email", 30.0, "CC"), // regex + FK violation
    (4L, "dup@x.io", 40.0, "BB"),  // duplicate key
    (5L, "eve@z.net", 1e9, null)   // range + null FK (FK skips nulls)
  ).toDF("id", "email", "amount", "country")

  private lazy val dims = Seq("AA", "BB").toDF("code")

  private val rules = Seq(
    notNull("email"),
    inRange("amount", 0.0, 100.0),
    matches("email", "^[^@]+@[^@]+\\.[a-z]+$"))

  test("violation counts are exact, including uniqueness and FK") {
    val report = Expectations.check(dirty, rules, uniqueKey = Seq("id"),
      foreignKeys = Map("fk(country->code)" -> (("country", dims, "code"))))
    val byName = report.map(v => v.rule -> v.violations).toMap
    assert(byName("not_null(email)") == 1)
    assert(byName("in_range(amount)") == 2) // -5 and 1e9
    assert(byName("matches(email)") == 2)   // null + not-an-email
    assert(byName("unique(id)") == 1)       // one extra row for id=4
    assert(byName("fk(country->code)") == 1) // CC; null country skipped
    assert(report.count(_.passed) == 0)
  }

  test("checkFrame equals check row-for-row (the distributable report shape)") {
    val asFrame = Expectations.checkFrame(dirty, rules, uniqueKey = Seq("id"),
        foreignKeys = Map("fk(country->code)" -> (("country", dims, "code"))))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val asSeq = Expectations.check(dirty, rules, uniqueKey = Seq("id"),
        foreignKeys = Map("fk(country->code)" -> (("country", dims, "code"))))
      .map(v => v.rule -> v.violations).toMap
    assert(asFrame == asSeq)
  }

  test("FK check works when child and dim key columns share a name") {
    val dimsSameName = dims.withColumnRenamed("code", "country")
    val report = Expectations.check(dirty, Nil,
      foreignKeys = Map("fk" -> (("country", dimsSameName, "country"))))
    assert(report.head.violations == 1)
  }

  test("a clean table passes every rule") {
    val clean = dirty.filter(col("id") === 1L)
    val report = Expectations.check(clean, rules, uniqueKey = Seq("id"),
      foreignKeys = Map("fk" -> (("country", dims, "code"))))
    assert(report.forall(_.passed))
  }

  test("NULL predicate results quarantine, not pass") {
    // col('amount') > 15 is NULL for a null amount — must violate
    val withNull = Seq((1L, Some(20.0)), (2L, None))
      .toDF("id", "amount")
    val r = Seq(satisfies("gt15", col("amount") > 15.0))
    val report = Expectations.check(withNull, r)
    assert(report.head.violations == 1)
    val (good, bad) = Expectations.split(withNull, r)
    assert(good.count() == 1 && bad.count() == 1)
  }

  test("split quarantines exactly the counted rows and names broken rules") {
    val (good, bad) = Expectations.split(dirty, rules)
    assert(good.count() == 2 && bad.count() == 4) // ids 1, 4(dup) pass rows
    val failsOf = bad.select(col("id"), col("email"), col("__failed")).collect()
      .map(r => (r.getLong(0), Option(r.getString(1))) -> r.getSeq[String](2).toSet).toMap
    assert(failsOf((3L, Some("bob@y.org"))) == Set("in_range(amount)"))
    assert(failsOf((2L, None)) == Set("not_null(email)", "matches(email)"))
    // every quarantined row broke at least one rule; good rows broke none
    assert(failsOf.values.forall(_.nonEmpty))
  }

  test("quantile rules gate distribution drift in the same single pass") {
    // amounts: -5, 10, 20, 30, 40, 1e9 → sketch p50 ≈ 20-30
    val ok = Expectations.check(dirty, Nil,
      distributions = Seq(quantileBetween("amount", 0.5, 0.0, 100.0)))
    assert(ok.map(v => v.rule -> v.passed) ==
      Seq("quantile(amount,0.5)" -> true))
    // a drifted bound fails as ONE violation (binary table rule)
    val drift = Expectations.check(dirty, Nil,
      distributions = Seq(quantileBetween("amount", 0.5, 1000.0, 2000.0)))
    assert(drift == Seq(Violation("quantile(amount,0.5)", 1L)))
    // composes with row rules without an extra scan: one LocalTableScan
    val mixed = Expectations.check(dirty, rules, uniqueKey = Seq("id"),
      distributions = Seq(quantileBetween("amount", 0.5, 0.0, 100.0)))
    assert(mixed.length == rules.length + 2)
    assert(mixed.count(!_.passed) == 4) // email, range, regex, unique
  }

  test("empty input: quantile rules pass vacuously, matching row rules") {
    // an empty frame (or all-null column) makes the sketch readout
    // null; both rule kinds must agree that zero rows = zero
    // violations, or a legitimately empty partition fails one gate and
    // passes the other (round-7 ADVICE)
    val empty = dirty.filter(lit(false))
    val out = Expectations.check(empty, rules, uniqueKey = Seq("id"),
      distributions = Seq(quantileBetween("amount", 0.5, 0.0, 100.0)))
    assert(out.nonEmpty && out.forall(_.passed), out.toString)
    val allNull = dirty.withColumn("amount", lit(null).cast("double"))
    val nn = Expectations.check(allNull, Nil,
      distributions = Seq(quantileBetween("amount", 0.5, 0.0, 100.0)))
    assert(nn.forall(_.passed), nn.toString)
  }

  test("row rules + uniqueness evaluate as one aggregate job (single scan)") {
    val rowAndUnique = dirty.agg(
      sum(when(coalesce(rules.head.rowPredicate.get, lit(false)), 0L)
        .otherwise(1L)),
      count(lit(1)) - count_distinct(struct(col("id"))))
    val plan = rowAndUnique.queryExecution.executedPlan.toString
    // one scan of the input: a LocalTableScan (literal test data) or
    // one FileScan — never two
    val scans = "(?i)(LocalTableScan|Scan parquet)".r.findAllIn(plan).length
    assert(scans == 1, s"expected a single scan:\n$plan")
  }

  test("checkFrame on an empty batch reports 0 violations per rule, never null") {
    val report = Expectations.checkFrame(dirty.limit(0), rules,
        uniqueKey = Seq("id"),
        foreignKeys = Map("fk(country->code)" -> (("country", dims, "code"))))
      .collect()
    assert(report.length == rules.size + 2)
    assert(report.forall(r => !r.isNullAt(1) && r.getLong(1) == 0L),
      report.mkString(", "))
  }

  test("colliding check names fail fast with the offending name") {
    // an FK check named like a row rule (or the uniqueness alias)
    // would otherwise surface as an opaque ambiguous-column
    // AnalysisException in the post-agg select (r11 ADVICE) — both
    // report shapes must refuse up front, naming the collision
    val ex = intercept[IllegalArgumentException] {
      Expectations.checkFrame(dirty, rules,
        foreignKeys = Map("not_null(email)" -> (("country", dims, "code"))))
    }
    assert(ex.getMessage.contains("not_null(email)"), ex.getMessage)
    val ex2 = intercept[IllegalArgumentException] {
      Expectations.check(dirty, Nil, uniqueKey = Seq("id"),
        foreignKeys = Map("unique(id)" -> (("country", dims, "code"))))
    }
    assert(ex2.getMessage.contains("unique(id)"), ex2.getMessage)
    // the sketch columns share the aggregate under __kll_ prefixes —
    // same class: a rule named like a prefixed distribution, or two
    // same-named distributions, must refuse up front too
    val ex3 = intercept[IllegalArgumentException] {
      Expectations.check(dirty,
        Seq(satisfies("__kll_quantile(amount,0.5)", col("amount") > 0)),
        distributions = Seq(quantileBetween("amount", 0.5, 0.0, 100.0)))
    }
    assert(ex3.getMessage.contains("__kll_quantile(amount,0.5)"),
      ex3.getMessage)
    val ex4 = intercept[IllegalArgumentException] {
      Expectations.check(dirty, Nil, distributions = Seq(
        quantileBetween("amount", 0.5, 0.0, 100.0),
        quantileBetween("amount", 0.5, 1.0, 2.0)))
    }
    assert(ex4.getMessage.contains("__kll_quantile(amount,0.5)"),
      ex4.getMessage)
  }

  test("foreign-key checks ride the same single scan of the fact") {
    // r11: FK flags fold into the shared aggregate via broadcast
    // left-outer joins — the fact must appear ONCE in the plan no
    // matter how many FKs are checked (the anti-join form re-scanned
    // it per key), and the counts must equal the anti-join semantics
    val frame = Expectations.checkFrame(dirty, rules,
      uniqueKey = Seq("id"),
      foreignKeys = Map(
        "fk(country->code)" -> (("country", dims, "code")),
        "fk2(country->code)" -> (("country", dims, "code"))))
    val plan = frame.queryExecution.executedPlan.toString
    // the fact scans once; the two dim scans are the broadcast sides
    val factScans = plan.linesIterator
      .count(l => "(?i)(LocalTableScan|Scan parquet)".r.findFirstIn(l).nonEmpty &&
        l.contains("email"))
    assert(factScans == 1, s"expected a single fact scan:\n$plan")
    val byName = frame.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byName("fk(country->code)") == 1 && byName("fk2(country->code)") == 1)
    assert(byName("unique(id)") == 1 && byName("not_null(email)") == 1)
  }
}
