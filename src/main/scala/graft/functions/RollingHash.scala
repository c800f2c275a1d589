package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen Rabin-Karp rolling hash over a string column:
  * `h = (h*31 + code(c)) mod 1e9+7` folded left-to-right, h0 = 0.
  *
  * Replaces the declarative idiom
  * `aggregate(transform(split(s, ''), c -> ascii(c)), 0L, (h, c) -> …)`
  * — three nested higher-order functions, all `CodegenFallback`: per
  * ROW they allocate a char-array, an int-array, and interpret two
  * lambdas per character. At 100 TB of documents that interpretation
  * is the fingerprinting hot path; this kernel is one codegen'd loop
  * over UTF-16 code units with zero allocation.
  *
  * Semantics match the HOF chain exactly (RollingHashSpec asserts
  * bitwise equality, including non-BMP input): Spark's `split(s, '')`
  * emits one string per Unicode CODE POINT and `ascii` returns
  * `codePointAt(0)`, so the fold must step by code points —
  * `codePointAt` + `Character.charCount`, not `charAt` (a
  * supplementary char is ONE fold step of its code point, not two
  * surrogate steps). Null input yields null; the empty string folds
  * zero elements → 0.
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_rolling_hash"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${child.dataType.catalogString}")

  protected override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 31 + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    h
  }

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val s = ctx.freshName("rhStr")
    val h = ctx.freshName("rhAcc")
    val i = ctx.freshName("rhIdx")
    val cp = ctx.freshName("rhCp")
    nullSafeCodeGen(ctx, ev, in =>
      s"""
         |String $s = $in.toString();
         |long $h = 0L;
         |int $i = 0;
         |while ($i < $s.length()) {
         |  int $cp = $s.codePointAt($i);
         |  $h = ($h * 31L + $cp) % 1000000007L;
         |  $i += java.lang.Character.charCount($cp);
         |}
         |${ev.value} = $h;
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingHash {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  /** Column API: BIGINT rolling hash of a string column. */
  def rollingHash(s: Column): Column =
    ColumnBridge.column(RollingHash(ColumnBridge.expression(s)))
}
