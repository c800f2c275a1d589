package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native codegen micro-unit-quantized integer dot product:
  * `Σ round(a[i]·10⁶) · (long) b[i]` as BIGINT — the per-bit sum of
  * `Similarity.lshBucketQuantized`, whose contract is bit-identical
  * bucket ids on any engine (every term and partial sum is exact
  * integer arithmetic; magnitudes: |plane| < 2²³, |round(x·10⁶)| ≤
  * ~2²⁰·|x|, 64 terms — comfortably inside BIGINT).
  *
  * Why a kernel: the HOF formulation (`aggregate(zip_with(...))`) is
  * `CodegenFallback` — per-row interpreted lambda dispatch per
  * element, measured ~0.18 s per 2 000 rows × 8 bits × 64 dims at
  * sf0.1 (and the bucket is computed on BOTH sides of the self-join).
  * Same motivation as [[DotProduct]], which removed the identical
  * bottleneck from the cosine pair joins.
  *
  * Rounding is half-away-from-zero evaluated EXACTLY on the binary
  * double value (`frac = t - floor(t)` is an exact FP subtraction, so
  * the tie test has no double-add rounding hazard) — the semantics of
  * DuckDB's `round(DOUBLE)`, which the oracle SQL mirrors
  * (`CAST(round(v[k] * 1000000.0) AS BIGINT)`); parity is gated by
  * the 3-SF burnin like every quantized contract. Null semantics
  * match the HOF form: null array, mismatched lengths, or a null
  * element yield null; non-finite values (NaN/Inf, where no integer
  * quantization exists) also yield null rather than a garbage cast —
  * all of which the caller's sentinel-bit guard turns into a raise.
  *
  * The left operand is the vector, the right the (integer-valued)
  * plane literal, both ARRAY<DOUBLE> (plane magnitudes < 2²³ are
  * exactly representable).
  */
case class QuantizedDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_quantized_dot"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression): Boolean = e.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (ARRAY<DOUBLE>, ARRAY<DOUBLE>), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }

  @transient private lazy val elementsNullable: Boolean =
    Seq(left, right).exists {
      _.dataType match {
        case ArrayType(_, containsNull) => containsNull
        case _ => false
      }
    }

  override def nullable: Boolean = true

  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (elementsNullable && (x.isNullAt(i) || y.isNullAt(i))) return null
      val t = x.getDouble(i) * 1000000.0
      if (java.lang.Double.isNaN(t) || java.lang.Double.isInfinite(t)) return null
      val fl = Math.floor(t)
      val fr = t - fl
      val r = fl.toLong + (if (fr > 0.5 || (fr == 0.5 && t > 0.0)) 1L else 0L)
      s += r * y.getDouble(i).toLong
      i += 1
    }
    s
  }

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val xa = ctx.freshName("graftQDotA")
    val xb = ctx.freshName("graftQDotB")
    val n = ctx.freshName("graftQDotN")
    val s = ctx.freshName("graftQDotS")
    val i = ctx.freshName("graftQDotI")
    val t = ctx.freshName("graftQDotT")
    val fl = ctx.freshName("graftQDotF")
    val fr = ctx.freshName("graftQDotR")
    val nullCheck = if (elementsNullable)
      s"""if ($xa.isNullAt($i) || $xb.isNullAt($i)) {
         |  ${ev.isNull} = true; break;
         |}""".stripMargin
    else ""
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $xa = $a;
         |org.apache.spark.sql.catalyst.util.ArrayData $xb = $b;
         |int $n = $xa.numElements();
         |if ($n != $xb.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $s = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    double $t = $xa.getDouble($i) * 1000000.0d;
         |    if (Double.isNaN($t) || Double.isInfinite($t)) {
         |      ${ev.isNull} = true; break;
         |    }
         |    double $fl = Math.floor($t);
         |    double $fr = $t - $fl;
         |    $s += ((long) $fl + (($fr > 0.5d || ($fr == 0.5d && $t > 0.0d)) ? 1L : 0L))
         |        * (long) $xb.getDouble($i);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
