package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

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
  * Null handling matches the HOF chain exactly (required for the
  * FuseDotProduct rewrite to be semantics-preserving): a null array
  * yields null, and a null ELEMENT in the paired range yields null —
  * `zip_with`'s `x*y` is null there and `aggregate`'s `acc+x` then
  * poisons the fold. The element-null branch is emitted only when the
  * array types admit null elements, so dense-vector call sites keep
  * the branch-free loop.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  // No ExpectsInputTypes: AbstractDataType is private[sql] in Spark 4.
  // Call sites must pass ARRAY<DOUBLE> (cast("array<double>") first).

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  private def elementsNullable: Boolean = Seq(left, right).exists {
    _.dataType match {
      case ArrayType(_, containsNull) => containsNull
      case _ => false
    }
  }

  override def nullable: Boolean =
    left.nullable || right.nullable || elementsNullable

  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    if (elementsNullable) {
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        s += x.getDouble(i) * y.getDouble(i)
        i += 1
      }
    } else {
      while (i < n) {
        s += x.getDouble(i) * y.getDouble(i)
        i += 1
      }
    }
    s
  }

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val nullCheck = if (elementsNullable)
      s"""if (graftDotA.isNullAt(graftDotI) || graftDotB.isNullAt(graftDotI)) {
         |  ${ev.isNull} = true; break;
         |}""".stripMargin
    else ""
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData graftDotA = $a;
         |org.apache.spark.sql.catalyst.util.ArrayData graftDotB = $b;
         |int graftDotN = java.lang.Math.min(graftDotA.numElements(), graftDotB.numElements());
         |double graftDotS = 0.0;
         |for (int graftDotI = 0; graftDotI < graftDotN; graftDotI++) {
         |  $nullCheck
         |  graftDotS += graftDotA.getDouble(graftDotI) * graftDotB.getDouble(graftDotI);
         |}
         |${ev.value} = graftDotS;
       """.stripMargin)
  }

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
