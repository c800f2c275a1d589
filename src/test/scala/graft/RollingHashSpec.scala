package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.RollingHash

/** The codegen rolling-hash kernel must be bitwise-equal to the HOF
  * chain it replaces (the q_text_rolling_hash idiom). */
class RollingHashSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val hof =
    """aggregate(
      |  transform(split(s, ''), c -> CAST(ascii(c) AS BIGINT)),
      |  CAST(0 AS BIGINT),
      |  (h, c) -> (h * 31 + c) % 1000000007)""".stripMargin

  test("kernel equals the HOF formulation on varied strings") {
    val rows = Seq("a", "hello world", "The quick brown fox", "  spaces  ",
      "punct!@#$%^&*()", "0123456789" * 20, "tab\tnewline\n",
      "ünïcödé BMP chars €¥", "x",
      // non-BMP: split('')/ascii step by CODE POINTS — one fold step
      // per supplementary char, not two surrogate steps
      "emoji 😀 and 𝄞 clef", "𝄞x")
    val df = rows.toDF("s")
    val out = df.select(
        expr(hof).as("hof"),
        RollingHash.rollingHash(col("s")).as("native"))
      .collect()
    out.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
  }

  test("null yields null; empty string yields 0; codegen active") {
    val df = Seq(Some("abc"), None, Some("")).toDF("s")
    val out = df.select(RollingHash.rollingHash(col("s")).as("h")).collect()
    assert(out(0).getLong(0) == ((('a' * 31L + 'b') % 1000000007L * 31 + 'c') % 1000000007L))
    assert(out(1).isNullAt(0))
    assert(out(2).getLong(0) == 0L)
    // the kernel must not force the whole stage out of codegen (use a
    // parquet-backed scan — a local relation folds the projection away)
    val plan = graft.queries.t(spark, sfTiny, "documents")
      .select(RollingHash.rollingHash(col("text")))
      .queryExecution.executedPlan
    // "*(n)" prefixes mark whole-stage-codegen spans in treeString
    assert(plan.toString.contains("*(1) Project [graft_rolling_hash"), plan.toString)
  }

  test("matches the full-table HOF output on the documents fixture") {
    val docs = graft.queries.t(spark, sfTiny, "documents")
      .filter(length(col("text")) > 0)
      .select(col("doc_id"), substring(col("text"), 1, 40).as("s"))
    val cmp = docs.select(col("doc_id"), expr(hof).as("a"),
        RollingHash.rollingHash(col("s")).as("b"))
      .filter(col("a") =!= col("b"))
    assert(cmp.count() == 0)
  }
}
