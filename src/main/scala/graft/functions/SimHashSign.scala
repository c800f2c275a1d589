package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen SimHash signature from per-token md5-hex prefixes:
  * the `nBits`-char '0'/'1' string whose bit j is the sign of
  * `Σ_tokens (((nibble(hx, j/4) >> (j%4)) & 1) · 2 − 1)` — exactly
  * the per-bit HOF folds of `Dedup.simHashRowLocal`, which this
  * kernel replaces as ONE pass over the token array.
  *
  * Why a kernel: the row-local (stream-safe, stateless) signature
  * path evaluated `nBits` separate `aggregate()` higher-order folds
  * per document — `CodegenFallback`, i.e. nBits·|tokens| interpreted
  * lambda steps per row, the documented "price of statelessness" on
  * every arriving stream document and every band-key probe. The
  * kernel is the same arithmetic in a tight loop: per token, one hex
  * digit decode per nibble and four add/subtracts — the whole
  * signature in O(|tokens|·nBits) raw byte ops, no per-bit re-scan.
  * Measured at ×16 documents (80 000 docs, 64 bits, forced full
  * evaluation — count()-based probes PRUNE the signature expression
  * and measure nothing): 26.1 s HOF → 1.45 s kernel, and the
  * remainder is the per-token md5-hex build the kernel consumes.
  *
  * Byte-identical to both the aggregate signature form and the old
  * HOF row-local form (OpsSpec gates row-local == aggregate at 32 and
  * 64 bits, plus band-key parity): same nibble order (hex char j/4),
  * same LSB-first bit-in-nibble order (j%4), same `sum > 0 → '1'`
  * threshold. Input is the materialized `__hx` column (each element
  * an `nBits/4`-char lowercase-hex md5 prefix, built once per token).
  * Null array → null; a null element or a non-hex byte → null (the
  * HOF form's null-poisoned fold mapped such rows to all-'0' — a
  * silent mega-bucket; null is the loud version, and impossible for
  * real md5 output).
  */
case class SimHashSign(child: Expression, nBits: Int)
    extends UnaryExpression {

  require(nBits % 4 == 0 && nBits >= 8 && nBits <= 128,
    s"nBits must be a multiple of 4 in [8,128], got $nBits")

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_simhash_sign"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING>, got ${other.catalogString}")
  }

  override def nullable: Boolean = true

  protected override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val nHex = nBits / 4
    val counts = new Array[Int](nBits)
    var t = 0
    while (t < n) {
      if (arr.isNullAt(t)) return null
      val hx = arr.getUTF8String(t)
      if (hx.numBytes() < nHex) return null
      var pos = 0
      while (pos < nHex) {
        val b = hx.getByte(pos)
        val d =
          if (b >= '0' && b <= '9') b - '0'
          else if (b >= 'a' && b <= 'f') b - 'a' + 10
          else return null
        val base = pos * 4
        counts(base) += ((d & 1) << 1) - 1
        counts(base + 1) += (((d >> 1) & 1) << 1) - 1
        counts(base + 2) += (((d >> 2) & 1) << 1) - 1
        counts(base + 3) += (((d >> 3) & 1) << 1) - 1
        pos += 1
      }
      t += 1
    }
    val out = new Array[Byte](nBits)
    var j = 0
    while (j < nBits) {
      out(j) = if (counts(j) > 0) '1' else '0'
      j += 1
    }
    UTF8String.fromBytes(out)
  }

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val arr = ctx.freshName("graftShArr")
    val n = ctx.freshName("graftShN")
    val counts = ctx.freshName("graftShC")
    val t = ctx.freshName("graftShT")
    val hx = ctx.freshName("graftShHx")
    val pos = ctx.freshName("graftShP")
    val b = ctx.freshName("graftShB")
    val d = ctx.freshName("graftShD")
    val base = ctx.freshName("graftShBase")
    val out = ctx.freshName("graftShOut")
    val j = ctx.freshName("graftShJ")
    val nHex = nBits / 4
    nullSafeCodeGen(ctx, ev, a =>
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $arr = $a;
         |int $n = $arr.numElements();
         |int[] $counts = new int[$nBits];
         |for (int $t = 0; $t < $n && !${ev.isNull}; $t++) {
         |  if ($arr.isNullAt($t)) { ${ev.isNull} = true; break; }
         |  org.apache.spark.unsafe.types.UTF8String $hx = $arr.getUTF8String($t);
         |  if ($hx.numBytes() < $nHex) { ${ev.isNull} = true; break; }
         |  for (int $pos = 0; $pos < $nHex; $pos++) {
         |    byte $b = $hx.getByte($pos);
         |    int $d;
         |    if ($b >= '0' && $b <= '9') { $d = $b - '0'; }
         |    else if ($b >= 'a' && $b <= 'f') { $d = $b - 'a' + 10; }
         |    else { ${ev.isNull} = true; break; }
         |    int $base = $pos * 4;
         |    $counts[$base] += (($d & 1) << 1) - 1;
         |    $counts[$base + 1] += ((($d >> 1) & 1) << 1) - 1;
         |    $counts[$base + 2] += ((($d >> 2) & 1) << 1) - 1;
         |    $counts[$base + 3] += ((($d >> 3) & 1) << 1) - 1;
         |  }
         |}
         |if (!${ev.isNull}) {
         |  byte[] $out = new byte[$nBits];
         |  for (int $j = 0; $j < $nBits; $j++) {
         |    $out[$j] = $counts[$j] > 0 ? (byte) '1' : (byte) '0';
         |  }
         |  ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromBytes($out);
         |}
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashSign {
  /** SQL builder: `graft_simhash_sign(hexes, nBits)`, literal nBits. */
  private[graft] def build(children: Seq[Expression]): Expression = {
    require(children.length == 2,
      s"graft_simhash_sign requires (hexes, nBits), got ${children.length} arguments")
    SimHashSign(children.head, TopKAgg.foldableInt(children(1), "nBits"))
  }
}
