package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, IntegerType}

/** Product-quantization encode: an `ARRAY<DOUBLE>` vector of
  * `m × dsub` dimensions becomes `m` one-byte codes (`BINARY`, each
  * `[0, kc)`, kc ≤ 256 — 64× smaller than the raw doubles at the
  * m=8/64-dim default) — the nearest codebook centroid per subspace by squared
  * L2, ties to the LOWER code (strict `<` scan). One kernel pass
  * (`m × kc × dsub` multiply-adds) instead of an `m × kc`-term
  * `least(struct(...))` expression tree, which at realistic sizes
  * re-creates the generated-code blowup the bucket-join work
  * documented (huge single methods past the JIT limit); here the
  * codebook rides along as ONE referenced object and the generated
  * code is a single static call.
  *
  * The codebook is FLAT row-major: `codebookFlat(j*kc*dsub + c*dsub
  * + t)` = coordinate `t` of centroid `c` of subspace `j` — `dsub` is
  * derived, so the shape is fully determined by `(m, kc, length)`.
  *
  * Null contract (row-uniform, the [[QuantizedDot]] convention): null
  * vector, wrong length, or any null/non-finite element → null codes
  * (a NaN coordinate would otherwise poison every distance compare
  * and pick an arbitrary code). Cosine-contract normalization happens in the caller
  * (`Similarity.pqTrain/pqEncode` normalize the full vector first);
  * this kernel is metric-agnostic squared-L2.
  */
case class PqEncode(child: Expression, codebookFlat: IndexedSeq[Double],
    m: Int, kc: Int) extends UnaryExpression {
  require(m > 0 && kc > 0, s"pq_encode: m=$m, kc=$kc must be positive")
  require(kc <= 256, s"pq_encode: kc=$kc exceeds one byte per code")
  require(codebookFlat.nonEmpty && codebookFlat.length % (m * kc) == 0,
    s"pq_encode: codebook length ${codebookFlat.length} is not a " +
      s"multiple of m*kc = ${m * kc}")

  val dsub: Int = codebookFlat.length / (m * kc)

  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_pq_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<DOUBLE>, got ${other.catalogString}")
  }

  // wrong-length / null-element inputs null out even when the child
  // itself is non-nullable
  override def nullable: Boolean = true

  @transient private lazy val cb: Array[Double] = codebookFlat.toArray

  protected override def nullSafeEval(v: Any): Any =
    PqEncode.encode(v.asInstanceOf[ArrayData], cb, m, kc, dsub)

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("graftPqCodebook", cb, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      s"""
         |${ev.value} = graft.functions.PqEncode.encode($v, $cbRef, $m, $kc, $dsub);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqEncode {
  /** Nearest centroid per subspace; null on any malformed input
    * (see the class doc). Public static so generated code can call
    * it. */
  def encode(v: ArrayData, cb: Array[Double], m: Int, kc: Int,
      dsub: Int): Array[Byte] = {
    if (v.numElements() != m * dsub) return null
    val x = new Array[Double](m * dsub)
    var i = 0
    while (i < x.length) {
      if (v.isNullAt(i)) return null
      val d = v.getDouble(i)
      if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) return null
      x(i) = d
      i += 1
    }
    val codes = new Array[Byte](m)
    var j = 0
    while (j < m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < kc) {
        val off = (j * kc + c) * dsub
        var d2 = 0.0
        var t = 0
        while (t < dsub) {
          val diff = x(j * dsub + t) - cb(off + t)
          d2 += diff * diff
          t += 1
        }
        if (d2 < bestD) { bestD = d2; best = c }
        c += 1
      }
      codes(j) = best.toByte
      j += 1
    }
    codes
  }

  /** SQL builder: `graft_pq_encode(v, codebook_flat, m, kc)` with a
    * literal ARRAY<DOUBLE> flat codebook. */
  private[graft] def build(children: Seq[Expression]): Expression = {
    require(children.length == 4,
      s"graft_pq_encode requires (v, codebook_flat, m, kc), got ${children.length} arguments")
    val flat = PqCodecBuilders.foldableDoubleArray(children(1), "graft_pq_encode codebook")
    PqEncode(children.head, flat,
      PqCodecBuilders.foldableInt(children(2), "graft_pq_encode m"),
      PqCodecBuilders.foldableInt(children(3), "graft_pq_encode kc"))
  }
}

/** Asymmetric-distance (ADC) dot product: `BINARY` PQ codes plus a
  * per-query lookup table → `Σ_j lut(j*kc + code_j)` (DOUBLE), where
  * `lut(j*kc + c)` = dot(query subvector j, centroid c of subspace j).
  * The per-row cost is `m` array reads — this is the read-path payoff
  * of PQ: ranking a corpus costs O(m) per row against O(dims) for the
  * exact dot, over codes 64× smaller than the raw doubles.
  *
  * Null contract: null codes, wrong length (`lut.length != m*kc`
  * given `m = codes.length`) or an out-of-range code →
  * null (an out-of-range code means the codes were produced under a
  * DIFFERENT (m, kc) — the PQ twin of the persisted-LSH width hazard;
  * callers route persisted codes through `Similarity.checkedPqCodes`
  * to raise instead). */
case class PqAdcDot(child: Expression, lutFlat: IndexedSeq[Double], kc: Int)
    extends UnaryExpression {
  require(kc > 0 && kc <= 256, s"pq_adc: kc=$kc out of byte range")
  require(lutFlat.nonEmpty && lutFlat.length % kc == 0,
    s"pq_adc: lut length ${lutFlat.length} is not a multiple of kc = $kc")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_pq_adc"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires BINARY, got ${other.catalogString}")
  }

  override def nullable: Boolean = true

  @transient private lazy val lut: Array[Double] = lutFlat.toArray

  protected override def nullSafeEval(codes: Any): Any =
    PqAdcDot.adc(codes.asInstanceOf[Array[Byte]], lut, kc)

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lutRef = ctx.addReferenceObj("graftPqLut", lut, "double[]")
    // freshName per the Spark codegen convention: today each
    // nullSafeCodeGen body lands in its own block (measured: a fixed
    // name compiles fine under two ADC columns in one projection —
    // PqSpec pins that), but a fresh name removes the dependence on
    // that placement detail surviving future codegen refactors
    val boxed = ctx.freshName("graftAdcBoxed")
    nullSafeCodeGen(ctx, ev, codes => {
      s"""
         |Object $boxed = graft.functions.PqAdcDot.adc($codes, $lutRef, $kc);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((java.lang.Double) $boxed).doubleValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqAdcDot {
  /** Boxed so a malformed row can yield null; generated code unboxes
    * on the non-null path. Public static for codegen. */
  def adc(codes: Array[Byte], lut: Array[Double], kc: Int): java.lang.Double = {
    val m = codes.length
    if (m * kc != lut.length) return null
    var s = 0.0
    var j = 0
    while (j < m) {
      val c = codes(j) & 0xFF
      if (c >= kc) return null
      s += lut(j * kc + c)
      j += 1
    }
    java.lang.Double.valueOf(s)
  }

  /** SQL builder: `graft_pq_adc(codes, lut_flat, kc)` with a literal
    * ARRAY<DOUBLE> flat lookup table. */
  private[graft] def build(children: Seq[Expression]): Expression = {
    require(children.length == 3,
      s"graft_pq_adc requires (codes, lut_flat, kc), got ${children.length} arguments")
    PqAdcDot(children.head,
      PqCodecBuilders.foldableDoubleArray(children(1), "graft_pq_adc lut"),
      PqCodecBuilders.foldableInt(children(2), "graft_pq_adc kc"))
  }
}

/** Shared literal-extraction for the PQ SQL builders. */
private[functions] object PqCodecBuilders {
  def foldableInt(e: Expression, what: String): Int = e match {
    case f if f.foldable && f.dataType == IntegerType =>
      f.eval() match {
        case null => throw new IllegalArgumentException(s"$what: null literal")
        case v: Int => v
      }
    case _ => throw new IllegalArgumentException(
      s"$what must be an INT literal")
  }

  def foldableDoubleArray(e: Expression, what: String): IndexedSeq[Double] = e match {
    case f if f.foldable && (f.dataType match {
        case ArrayType(DoubleType, _) => true
        case _ => false
      }) =>
      f.eval() match {
        case null => throw new IllegalArgumentException(s"$what: null literal")
        case a: ArrayData =>
          val n = a.numElements()
          val out = new Array[Double](n)
          var i = 0
          while (i < n) {
            if (a.isNullAt(i))
              throw new IllegalArgumentException(s"$what: null element")
            out(i) = a.getDouble(i)
            i += 1
          }
          out.toIndexedSeq
      }
    case _ => throw new IllegalArgumentException(
      s"$what must be an ARRAY<DOUBLE> literal")
  }
}
