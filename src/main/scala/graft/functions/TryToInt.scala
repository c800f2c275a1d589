package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Exception-free `try_cast(s AS INT)`: value-identical to Spark's
  * TRY-mode string→int cast, without the per-failing-row exception.
  *
  * Under ANSI mode (Spark 4's default) TRY cast implements "NULL on
  * bad input" by CATCHING the ANSI cast's error, and that error —
  * `SparkNumberFormatException` with formatted message + query
  * context — is constructed per failing row: measured ~8 µs/row,
  * which made q_try_semantics' 150 k all-failing rows cost 1.33 s of
  * pure exception churn inside an otherwise 0.2 s aggregate (r15
  * honest-bench flag, 30× DuckDB — the probe is TimeProbe). DuckDB's
  * TRY_CAST returns its failure flag without unwinding, which is the
  * entire 30×. This kernel takes the same exception-free path Spark's
  * LEGACY cast uses — `UTF8String.trimAll().toInt(IntWrapper)`, a
  * boolean-failure parse — wrapped as a codegen'd expression, so the
  * fast path stays inside whole-stage codegen with zero allocation
  * (the IntWrapper is per-instance mutable state, interpreted path;
  * codegen adds it as generated-class mutable state).
  *
  * Parity contract (BehaviorSpec pins it per-value against literal
  * `try_cast(x AS INT)` over the adversarial matrix — signs,
  * whitespace variants, INT_MIN/MAX ± 1, decimals, empty, unicode
  * digits, embedded NULs): ANSI string→int acceptance over the
  * trimAll'd input is optional sign + ≥1 ASCII digit to end-of-string
  * + int range. NOT UTF8String.toInt — the LEGACY parse truncates at
  * a decimal point ('3.7' → 3 where try_cast yields NULL; the parity
  * spec caught exactly that), so [[TryToInt.parse]] implements the
  * strict grammar directly, returning a Long.MinValue sentinel (not
  * representable as an INT value) instead of unwinding. */
case class TryToInt(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_try_to_int"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${child.dataType.catalogString}")

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else {
      val r = TryToInt.parse(v.asInstanceOf[UTF8String])
      if (r == Long.MinValue) null else r.toInt
    }
  }

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val r = ctx.freshName("graftTryToInt")
    ev.copy(code = code"""
      ${childGen.code}
      boolean ${ev.isNull} = true;
      int ${ev.value} = 0;
      if (!${childGen.isNull}) {
        long $r = graft.functions.TryToInt.parse(${childGen.value});
        if ($r != java.lang.Long.MIN_VALUE) {
          ${ev.isNull} = false;
          ${ev.value} = (int) $r;
        }
      }""")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TryToInt {
  private[graft] def build(children: Seq[Expression]): Expression = {
    require(children.length == 1,
      s"graft_try_to_int requires exactly 1 argument, got ${children.length}")
    TryToInt(children.head)
  }

  /** Strict ANSI string→int grammar, exception-free: trimAll, then
    * optional sign + at least one ASCII digit running to end of
    * string, within int range. Returns the value, or Long.MinValue
    * (not representable as an INT) on any failure. Magnitude
    * accumulates in a long and is capped at 2^31 right after each
    * digit, so overflow detection never itself overflows. */
  def parse(input: UTF8String): Long = {
    val s = input.trimAll()
    val n = s.numBytes()
    if (n == 0) return Long.MinValue
    val b0 = s.getByte(0)
    var i = if (b0 == '+' || b0 == '-') 1 else 0
    if (i == n) return Long.MinValue
    var acc = 0L
    while (i < n) {
      val b = s.getByte(i)
      if (b < '0' || b > '9') return Long.MinValue
      acc = acc * 10 + (b - '0')
      if (acc > 2147483648L) return Long.MinValue
      i += 1
    }
    val v = if (b0 == '-') -acc else acc
    if (v < Int.MinValue || v > Int.MaxValue) Long.MinValue else v
  }
}
