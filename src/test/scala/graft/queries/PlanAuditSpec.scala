package graft.queries

import org.apache.spark.sql.catalyst.expressions.HigherOrderFunction
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The PlanAudit lambda-subtree detector must actually FIRE on the
  * r10 hazard shape (an expensive outer subtree referenced inside a
  * HOF lambda — re-evaluated once per element, no CSE per
  * SPARK-35886) and stay quiet on the benign shapes — otherwise the
  * gate's "0 new hits" proves nothing.
  */
class PlanAuditSpec extends AnyFunSuite {
  import graft.TestSpark.spark

  private def hofSubtrees(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val hofs = df.queryExecution.optimizedPlan.collect { case node =>
      node.expressions.flatMap(_.collect { case h: HigherOrderFunction => h })
    }.flatten
    hofs.flatMap(_.functions.flatMap {
      case lf: org.apache.spark.sql.catalyst.expressions.LambdaFunction =>
        PlanAudit.outerSubtrees(lf.function).map(_.toString)
      case _ => Seq.empty
    })
  }

  test("detector fires on an outer split() re-evaluated inside a transform lambda") {
    // range (not a local Seq): ConvertToLocalRelation would eagerly
    // evaluate a deterministic projection over LocalRelation data and
    // the optimized plan would hold no expressions to sweep
    val df = spark.range(2)
      .select(concat(lit("a b c "), col("id")).as("text"))
      // the exact r10 shingleArray shape: element_at(split(text), i)
      // inside the lambda — split re-runs per element
      .select(expr(
        "transform(sequence(1, 2), i -> element_at(split(text, ' '), i))").as("w"))
    val hits = hofSubtrees(df)
    assert(hits.exists(_.contains("split")), s"detector missed the hazard: $hits")
  }

  test("global-window detector fires on a partition-less window, quiet on partitioned") {
    import org.apache.spark.sql.expressions.Window
    val base = spark.range(8).select(col("id"), (col("id") % 2).as("g"))
    val global = base.select(col("id"),
      sum(col("id")).over(Window.partitionBy()).as("s"))
    assert(PlanAudit.globalWindows(global.queryExecution.executedPlan) == 1)
    val partitioned = base.select(col("id"),
      sum(col("id")).over(Window.partitionBy(col("g"))).as("s"))
    assert(PlanAudit.globalWindows(partitioned.queryExecution.executedPlan) == 0)
  }

  test("detector stays quiet on lambda-var-only and bare-attribute bodies") {
    val df = spark.range(2)
      .select(array(col("id") * 1.0, col("id") * 2.0).as("a"),
        array(col("id") * 3.0, col("id") * 4.0).as("b"),
        (col("id") * 1.0).as("s"))
      .select(
        expr("zip_with(a, b, (x, y) -> x * y)").as("z"),
        // outer bare attribute inside the lambda: a column read per
        // element is the lambda's job, not a recompute hazard
        expr("transform(a, x -> x * s)").as("t"))
    assert(hofSubtrees(df).isEmpty)
  }
}
