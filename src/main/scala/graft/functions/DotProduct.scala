package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native codegen dot product over two `ARRAY<DOUBLE>` columns.
  *
  * Spark's higher-order functions (`zip_with` + `aggregate`) are
  * `CodegenFallback`: every evaluation allocates an intermediate array
  * and interprets the lambda per element. For the all-pairs cosine
  * workloads (SURVEY.md §2.11 q_dedup_embed_topk / q_ann_topk — the
  * north-star similarity operators) that interpretation dominates the
  * runtime, and at 100 TB it is the difference between a codegen'd
  * 64-FLOP inner loop and per-pair allocation churn.
  *
  * Semantics are kept bit-identical to the HOF formulation (and the
  * DuckDB oracle's `list_sum(list_transform(...))`): a strict
  * left-to-right IEEE-754 double summation of `a[i] * b[i]`. The
  * squared L2 norm is `DotProduct(v, v)` — the same sequential sum of
  * `x_i * x_i` the HOF chain produces, so precomputing norms before a
  * pair join changes nothing in the emitted values.
  *
  * Null handling: a null array yields null (BinaryExpression default);
  * array *elements* are assumed non-null (embeddings are dense vectors
  * — `FIXTURES.md`: exactly 64 non-null floats).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  // No ExpectsInputTypes: AbstractDataType is private[sql] in Spark 4.
  // Call sites must pass ARRAY<DOUBLE> (cast("array<double>") first).

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |int graftDotN = java.lang.Math.min($a.numElements(), $b.numElements());
         |double graftDotS = 0.0;
         |for (int graftDotI = 0; graftDotI < graftDotN; graftDotI++) {
         |  graftDotS += $a.getDouble(graftDotI) * $b.getDouble(graftDotI);
         |}
         |${ev.value} = graftDotS;
       """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Session registration for graft's native expressions (idempotent). */
object GraftFunctions {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge
  import org.apache.spark.sql.functions.sqrt

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", exprs => DotProduct(exprs.head, exprs(1)), "built-in")
  }

  /** Column-level dot product (no registration needed). Inputs must be
    * ARRAY<DOUBLE> — `.cast("array<double>")` first. */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Cosine similarity via the codegen kernel; same sequential IEEE
    * summation as the zip_with+aggregate HOF formulation. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
}
