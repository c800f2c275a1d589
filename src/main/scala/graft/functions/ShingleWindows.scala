package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingles over a token array, one kernel pass:
  * `["a","b","c","d"]` with n=3 → `["a b c", "b c d"]`; null when the
  * document has fewer than `n` tokens. Byte-identical to the HOF
  * formulation `when(size(w) >= n, transform(sequence(1, size(w)-n+1),
  * i => concat_ws(" ", element_at(w, i), ..., element_at(w, i+n-1))))`
  * — including `concat_ws`'s treatment of empty tokens (joined as-is,
  * so consecutive delimiters in the source text survive into the
  * shingle).
  *
  * Why a kernel: in the HOF form the token array `w` is a `split`
  * SUBTREE referenced n times INSIDE the lambda, and lambda-bearing
  * expressions get no subexpression elimination (SPARK-35886) — so
  * the full regex split of the document re-ran n times PER SHINGLE
  * (3·|shingles| splits per doc at n=3). Measured at ×16 documents
  * (80 000 docs, forced evaluation): shingle-array construction alone
  * was 26.7 s; this kernel evaluates its token-array child once and
  * emits all windows in one O(|tokens|·n) pass. The shingle frame
  * feeds every MinHash/Jaccard/decontamination consumer, so this is
  * the input stage of the whole near-dedup family.
  *
  * Null array → null; a null ELEMENT → null result (the HOF form
  * would concat_ws-skip it, silently producing an (n−1)-token
  * shingle — a malformed key; token arrays from `split` never
  * contain nulls, so the loud contract costs nothing).
  */
case class ShingleWindows(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1 && n <= 32, s"shingle length must be in [1,32], got $n")

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_shingle_windows"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING>, got ${other.catalogString}")
  }

  override def nullable: Boolean = true

  protected override def nullSafeEval(a: Any): Any =
    ShingleWindows.windows(a.asInstanceOf[ArrayData], n)

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.util.GenericArrayData)
         |  graft.functions.ShingleWindows.windows($a, $n);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleWindows {
  private val space = UTF8String.fromString(" ")

  /** All n-token windows joined by single spaces; null if the array
    * is shorter than n or carries a null element. Public static so
    * generated code can call it. */
  def windows(arr: ArrayData, n: Int): GenericArrayData = {
    val len = arr.numElements()
    if (len < n) return null
    val toks = new Array[UTF8String](len)
    var i = 0
    while (i < len) {
      if (arr.isNullAt(i)) return null
      toks(i) = arr.getUTF8String(i)
      i += 1
    }
    val out = new Array[Any](len - n + 1)
    var s = 0
    while (s <= len - n) {
      // UTF8String.concatWs joins with the separator in one pass
      val parts = new Array[UTF8String](n)
      var k = 0
      while (k < n) { parts(k) = toks(s + k); k += 1 }
      out(s) = UTF8String.concatWs(space, parts: _*)
      s += 1
    }
    new GenericArrayData(out)
  }

  /** SQL builder: `graft_shingle_windows(tokens, n)`, literal n. */
  private[graft] def build(children: Seq[Expression]): Expression = {
    require(children.length == 2,
      s"graft_shingle_windows requires (tokens, n), got ${children.length} arguments")
    ShingleWindows(children.head, TopKAgg.foldableInt(children(1), "n"))
  }
}
