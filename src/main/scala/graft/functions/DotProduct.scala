package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
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
  * Semantics are kept identical to the HOF formulation (required for
  * the FuseDotProduct rewrite to be semantics-preserving, and matching
  * the DuckDB oracle's `list_sum(list_transform(...))`):
  *  - strict left-to-right IEEE-754 double summation of `a[i]*b[i]`
  *    (the squared L2 norm `DotProduct(v, v)` is therefore the same
  *    sequential sum the HOF chain produces);
  *  - a null array yields null;
  *  - a null ELEMENT yields null — `zip_with`'s `x*y` is null there
  *    and `aggregate`'s `acc+x` poisons the fold (branch emitted only
  *    when the array type admits null elements);
  *  - MISMATCHED lengths yield null — `zip_with` pads the shorter
  *    side with nulls, which poisons the fold the same way.
  *
  * Input types are enforced at analysis time via
  * `checkInputDataTypes` (public API; `ExpectsInputTypes` is not
  * usable — `AbstractDataType` is private[sql] in Spark 4).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

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

  // lazy val, not def: nullSafeEval consults this per ROW on the
  // interpreted path, and a def would re-allocate the Seq and
  // re-match both dataTypes for every row of a zero-allocation kernel
  @transient private lazy val elementsNullable: Boolean =
    Seq(left, right).exists {
      _.dataType match {
        case ArrayType(_, containsNull) => containsNull
        case _ => false
      }
    }

  // nullable even for non-null inputs: mismatched lengths yield null.
  override def nullable: Boolean = true

  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
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
    // fresh names: two kernels can land in one generated function
    // (cosine expands to three), so fixed names would collide.
    val xa = ctx.freshName("graftDotA")
    val xb = ctx.freshName("graftDotB")
    val n = ctx.freshName("graftDotN")
    val s = ctx.freshName("graftDotS")
    val i = ctx.freshName("graftDotI")
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
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    $s += $xa.getDouble($i) * $xb.getDouble($i);
         |  }
         |  ${ev.value} = $s;
         |}
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

  private[graft] def build(exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : DotProduct = {
    if (exprs.length != 2)
      throw new IllegalArgumentException(
        s"graft_dot requires exactly 2 arguments, got ${exprs.length}")
    DotProduct(exprs.head, exprs(1))
  }

  /** The SQL-callable kernel surface: (function name, implementing
    * class name for EXPLAIN/DESCRIBE info, builder). ONE catalog
    * consumed by BOTH registration paths — the imperative
    * [[register]] and the `graft.GraftExtensions` session-extension
    * injection — so the two cannot drift apart (before r11 the
    * extension path was missing graft_quantized_dot /
    * graft_top_k_pairs, and the r10/r11 kernels were SQL-callable
    * from neither). Scalar kernels register as-is; the aggregates'
    * returned AggregateFunction is wrapped by the analyzer, so
    * `graft_top_k(score, id, 3)` works in GROUP BY queries directly. */
  private[graft] val sqlKernels: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("graft_dot", classOf[DotProduct].getName,
      (children: Seq[Expression]) => build(children)),
    ("graft_quantized_dot", classOf[QuantizedDot].getName,
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"graft_quantized_dot requires exactly 2 arguments, got ${children.length}")
        QuantizedDot(children.head, children(1))
      }),
    ("graft_rolling_hash", classOf[RollingHash].getName,
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"graft_rolling_hash requires exactly 1 argument, got ${children.length}")
        RollingHash(children.head)
      }),
    ("graft_token_window_hash", classOf[TokenWindowHash].getName,
      TokenWindowHash.build _),
    ("graft_simhash_sign", classOf[SimHashSign].getName, SimHashSign.build _),
    ("graft_minhash_minima", classOf[MinHashMinima].getName,
      MinHashMinima.build _),
    ("graft_shingle_windows", classOf[ShingleWindows].getName,
      ShingleWindows.build _),
    ("graft_token_stats", classOf[TokenStats].getName, TokenStats.build _),
    ("graft_pq_encode", classOf[PqEncode].getName, PqEncode.build _),
    ("graft_pq_adc", classOf[PqAdcDot].getName, PqAdcDot.build _),
    ("graft_top_k", classOf[TopKAgg].getName, TopKAgg.build _),
    ("graft_top_k_pairs", classOf[TopKPairAgg].getName, TopKPairAgg.build _),
    ("graft_freq_items", classOf[FreqItemsAgg].getName, FreqItemsAgg.build _),
    ("graft_try_to_int", classOf[TryToInt].getName, TryToInt.build _))

  def register(spark: SparkSession): Unit = {
    // Register only if absent: createOrReplaceTempFunction logs a
    // "function replaced" WARN on every repeat call, which pollutes
    // stderr for every query that defensively re-registers.
    val registry = spark.sessionState.functionRegistry
    for ((name, _, builder) <- sqlKernels)
      if (!registry.functionExists(
          org.apache.spark.sql.catalyst.FunctionIdentifier(name))) {
        registry.createOrReplaceTempFunction(name, builder, "built-in")
      }
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

  /** Micro-unit-quantized integer dot (BIGINT) via the codegen kernel
    * — see [[QuantizedDot]] for the exact-rounding contract. */
  def quantizedDot(v: Column, plane: Column): Column =
    ColumnBridge.column(QuantizedDot(
      ColumnBridge.expression(v), ColumnBridge.expression(plane)))

  /** SimHash signature from per-token md5-hex prefixes via the
    * codegen kernel — see [[SimHashSign]] for the parity contract. */
  def simHashSign(hexes: Column, nBits: Int): Column =
    ColumnBridge.column(SimHashSign(ColumnBridge.expression(hexes), nBits))

  /** All MinHash minima over a shingle array in one kernel pass — see
    * [[MinHashMinima]] for the parity contract. */
  def minHashMinima(shingles: Column, numHashes: Int): Column =
    ColumnBridge.column(MinHashMinima(
      ColumnBridge.expression(shingles), numHashes))

  /** Word n-gram shingles over a token array in one kernel pass — see
    * [[ShingleWindows]] for the parity contract. */
  def shingleWindows(tokens: Column, n: Int): Column =
    ColumnBridge.column(ShingleWindows(ColumnBridge.expression(tokens), n))

  /** All row-local token statistics in one kernel pass — see
    * [[TokenStats]] for the parity contract. Equal calls (same text
    * expression, same stopword list) in one stage are CSE'd, so
    * deriving several gates from this struct costs one text scan. */
  def tokenStats(text: Column, stopwords: Seq[String] = Nil): Column =
    ColumnBridge.column(TokenStats(ColumnBridge.expression(text), stopwords))

  /** Product-quantization codes (m codes in [0, kc)) from an
    * ARRAY<DOUBLE> vector under a flat row-major codebook — see
    * [[PqEncode]] for the shape and null contract. */
  def pqEncode(v: Column, codebookFlat: IndexedSeq[Double], m: Int,
      kc: Int): Column =
    ColumnBridge.column(PqEncode(ColumnBridge.expression(v),
      codebookFlat, m, kc))

  /** Asymmetric-distance dot from PQ codes and a per-query flat
    * lookup table — see [[PqAdcDot]] for the null contract. */
  def pqAdc(codes: Column, lutFlat: IndexedSeq[Double], kc: Int): Column =
    ColumnBridge.column(PqAdcDot(ColumnBridge.expression(codes),
      lutFlat, kc))

  /** Exception-free `try_cast(s AS INT)` — see [[TryToInt]] for the
    * parity contract (value-identical to TRY-mode string→int). */
  def tryToInt(s: Column): Column =
    ColumnBridge.column(TryToInt(ColumnBridge.expression(s)))
}
