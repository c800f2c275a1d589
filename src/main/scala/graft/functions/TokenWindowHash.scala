package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass token-window Rabin-Karp: ARRAY<LONG> of one hash
  * per `w`-token window of a space-separated string — the hot path of
  * repeated-substring dedup (`graft.ops.SubstrDedup`).
  *
  * Replaces the declarative idiom
  * `transform(sequence(...), i -> aggregate(slice(tokenHashes, i+1, w),
  * 0L, (h,x) -> (h*B + x) % P))` — nested `CodegenFallback` HOFs that
  * interpret two lambdas per window element AND re-fold every window
  * from scratch: O(n·w) window work plus a per-window `slice` array
  * allocation. This kernel folds token char-hashes as it scans and
  * maintains the window polynomial with the classic rolling update
  * `H' = (H − t_lead·B^(w−1))·B + t_next mod P` — O(n) total, one
  * primitive long array allocated per row.
  *
  * Semantics are BIT-IDENTICAL to the HOF chain
  * (TokenWindowHashSpec asserts it on generated inputs):
  *  - tokens are `split(s, " ")` — single-space regex, trailing empty
  *    strings KEPT (Spark's split uses limit −1), so "a  b" has an
  *    empty middle token and "" is one empty token;
  *  - each token collapses to `graft_rolling_hash` semantics (code-
  *    point fold `h·31 + cp mod 1e9+7`, empty token → 0);
  *  - window fold `h·B + t mod P` with B = 1000003, P = 1e9+7, h0 = 0;
  *  - fewer than `w` tokens → empty array; null input → null.
  *
  * All intermediate products fit in a long: operands < P ≈ 2^30, so
  * products < 2^60. */
case class TokenWindowHash(child: Expression, w: Int)
  extends UnaryExpression {

  require(w >= 1, s"window must be >= 1 token, got $w")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_token_window_hash"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${child.dataType.catalogString}")

  protected override def nullSafeEval(input: Any): Any =
    TokenWindowHash.compute(input.asInstanceOf[UTF8String], w)

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.functions.TokenWindowHash.compute($in, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** [[TokenWindowHash]]'s dual-modulus twin: each window keys as
  * `h1·P2 + h2` where h1 is the standard (B, P) Rabin-Karp fold and
  * h2 an independent (B2, P2) fold over independently-hashed token
  * symbols — one combined BIGINT per window, computed in the same
  * single scan. A cross-text collision now needs BOTH 30-bit folds to
  * collide (~2⁻⁶⁰ per pair instead of ~2⁻³⁰), which takes the
  * birthday bound from "expect collisions at 10⁵ windows" to
  * "negligible below 10⁸" — the difference between a candidate signal
  * and a key the declared span query can hash-gate on. Product fits a
  * long: h1 < P ≈ 2³⁰, P2 < 2³⁰ ⇒ key < 2⁶⁰. */
case class TokenWindowDualHash(child: Expression, w: Int)
  extends UnaryExpression {

  require(w >= 1, s"window must be >= 1 token, got $w")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_token_window_dual_hash"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${child.dataType.catalogString}")

  protected override def nullSafeEval(input: Any): Any =
    TokenWindowHash.computeDual(input.asInstanceOf[UTF8String], w)

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.functions.TokenWindowHash.computeDual($in, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenWindowHash {
  private val B = 1000003L
  private val P = 1000000007L
  private val B2 = 1000033L
  private val P2 = 999999937L

  /** Shared by interpreted eval and codegen (the generated code is one
    * static call — no lambda interpretation, no per-window slices). */
  def compute(s: UTF8String, w: Int): ArrayData = {
    val str = s.toString
    // token char-hashes in one scan; split-semantics: single space,
    // empties kept ("" → one empty token hashing to 0)
    val n = str.length
    var nTokens = 1
    var i = 0
    while (i < n) { if (str.charAt(i) == ' ') nTokens += 1; i += 1 }
    val th = new Array[Long](nTokens)
    var t = 0
    var h = 0L
    i = 0
    while (i < n) {
      val c = str.charAt(i)
      if (c == ' ') { th(t) = h; t += 1; h = 0L; i += 1 }
      else {
        val cp = str.codePointAt(i)
        h = (h * 31L + cp) % P
        i += Character.charCount(cp)
      }
    }
    th(t) = h
    if (nTokens < w) return ArrayData.toArrayData(Array.emptyLongArray)
    // rolling window polynomial
    val out = new Array[Long](nTokens - w + 1)
    var bw1 = 1L // B^(w-1) mod P
    var k = 1
    while (k < w) { bw1 = bw1 * B % P; k += 1 }
    var hw = 0L
    i = 0
    while (i < w) { hw = (hw * B + th(i)) % P; i += 1 }
    out(0) = hw
    i = 1
    while (i <= nTokens - w) {
      hw = ((hw - th(i - 1) * bw1 % P + P) % P * B + th(i + w - 1)) % P
      out(i) = hw
      i += 1
    }
    ArrayData.toArrayData(out)
  }

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  /** Dual-modulus combined window keys (`h1·P2 + h2`, see
    * [[TokenWindowDualHash]]) — same single scan, independent (33, P2)
    * token symbols and (B2, P2) window fold for the second component.
    * The first component is exactly [[compute]]'s value (spec-pinned:
    * `dual(i) / P2 == single(i)`). */
  def computeDual(s: UTF8String, w: Int): ArrayData = {
    val str = s.toString
    val n = str.length
    var nTokens = 1
    var i = 0
    while (i < n) { if (str.charAt(i) == ' ') nTokens += 1; i += 1 }
    val th1 = new Array[Long](nTokens)
    val th2 = new Array[Long](nTokens)
    var t = 0
    var h1 = 0L
    var h2 = 0L
    i = 0
    while (i < n) {
      val c = str.charAt(i)
      if (c == ' ') { th1(t) = h1; th2(t) = h2; t += 1; h1 = 0L; h2 = 0L; i += 1 }
      else {
        val cp = str.codePointAt(i)
        h1 = (h1 * 31L + cp) % P
        h2 = (h2 * 33L + cp) % P2
        i += Character.charCount(cp)
      }
    }
    th1(t) = h1
    th2(t) = h2
    if (nTokens < w) return ArrayData.toArrayData(Array.emptyLongArray)
    val out = new Array[Long](nTokens - w + 1)
    var bw1 = 1L // B^(w-1) mod P
    var bw2 = 1L // B2^(w-1) mod P2
    var k = 1
    while (k < w) { bw1 = bw1 * B % P; bw2 = bw2 * B2 % P2; k += 1 }
    var hw1 = 0L
    var hw2 = 0L
    i = 0
    while (i < w) {
      hw1 = (hw1 * B + th1(i)) % P
      hw2 = (hw2 * B2 + th2(i)) % P2
      i += 1
    }
    out(0) = hw1 * P2 + hw2
    i = 1
    while (i <= nTokens - w) {
      hw1 = ((hw1 - th1(i - 1) * bw1 % P + P) % P * B + th1(i + w - 1)) % P
      hw2 = ((hw2 - th2(i - 1) * bw2 % P2 + P2) % P2 * B2 + th2(i + w - 1)) % P2
      out(i) = hw1 * P2 + hw2
      i += 1
    }
    ArrayData.toArrayData(out)
  }

  /** The second-component modulus — public so callers can recover the
    * single-hash component (`key / DualModulus`) when comparing
    * against [[compute]]. */
  val DualModulus: Long = P2

  /** Column API: ARRAY<BIGINT> of w-token window hashes. */
  def tokenWindowHash(s: Column, w: Int): Column =
    ColumnBridge.column(TokenWindowHash(ColumnBridge.expression(s), w))

  /** Column API: ARRAY<BIGINT> of dual-modulus combined window keys. */
  def tokenWindowDualHash(s: Column, w: Int): Column =
    ColumnBridge.column(TokenWindowDualHash(ColumnBridge.expression(s), w))

  /** SQL builder: `graft_token_window_hash(text, w)` with a literal
    * window size. */
  private[graft] def build(children: Seq[Expression]): TokenWindowHash = {
    require(children.length == 2,
      s"graft_token_window_hash requires (text, w), got ${children.length} arguments")
    val w = children(1) match {
      case e if e.foldable => e.eval() match {
        case i: Int => i
        case l: Long => l.toInt
        case v => throw new IllegalArgumentException(
          s"w must be an integer literal, got $v")
      }
      case _ => throw new IllegalArgumentException("w must be a literal")
    }
    TokenWindowHash(children.head, w)
  }
}
