package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** All row-local token statistics of a single-space-tokenized text in
  * ONE kernel pass: `STRUCT<n_tokens, n_distinct, stopword_hits,
  * char_len>` (all BIGINT). Byte-identical to the declarative family
  * over `w = split(text, " ")`:
  *   - `n_tokens`      = `size(w)`             (#spaces + 1; `""` is
  *     one empty token, runs of spaces yield empty tokens — exactly
  *     Java/Spark split-with-limit(-1) semantics on a literal space)
  *   - `n_distinct`    = `size(array_distinct(w))` (the empty token
  *     counts as a value, like any other)
  *   - `stopword_hits` = `size(filter(w, x -> x IN (stopwords)))`
  *   - `char_len`      = `length(text)` (CHARACTERS, not bytes)
  *
  * Why a kernel: the text-quality gates evaluated `split(text, " ")`
  * 4–6× per document — `tokens(text)` was re-instantiated inside
  * `stopwordRatio` (inside a `filter` HOF, which is excluded from
  * subexpression elimination per SPARK-35886), `typeTokenRatio`,
  * `avgWordLen` and `tokenCount`, so q_text_quality / q_quality_gates
  * / q_text_langid and CorpusClean's stage-1/2 gates each re-ran the
  * regex split several times per row. This kernel scans the UTF-8
  * bytes once (a 0x20 byte is always a real space — UTF-8
  * continuation bytes are ≥ 0x80), splitting, hashing for the
  * distinct set, and probing the stopword set in the same loop; every
  * derived gate is then a free struct-field read, and equal kernel
  * calls in one stage are CSE'd (codegen'd Expressions are not
  * lambda-excluded). KernelLawSpec gates byte-parity against the
  * declarative form, including empty/multi-space/trailing-space and
  * multi-byte inputs.
  *
  * Null text → null struct; the struct's fields are never null.
  */
case class TokenStats(child: Expression, stopwords: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = TokenStats.OutType

  override def prettyName: String = "graft_token_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${other.catalogString}")
  }

  override def nullable: Boolean = child.nullable

  @transient private lazy val stopSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](math.max(4, stopwords.size * 2))
    stopwords.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  protected override def nullSafeEval(t: Any): Any =
    TokenStats.stats(t.asInstanceOf[UTF8String], stopSet)

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("graftStopSet", stopSet,
      "java.util.HashSet<org.apache.spark.unsafe.types.UTF8String>")
    nullSafeCodeGen(ctx, ev, t => {
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.expressions.GenericInternalRow)
         |  graft.functions.TokenStats.stats($t, $setRef);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenStats {

  /** STRUCT<n_tokens BIGINT, n_distinct BIGINT, stopword_hits BIGINT,
    * char_len BIGINT>, no nullable fields. */
  val OutType: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("stopword_hits", LongType, nullable = false),
    StructField("char_len", LongType, nullable = false)))

  /** One pass over the UTF-8 bytes. Public static so generated code
    * can call it. */
  def stats(s: UTF8String, stop: java.util.HashSet[UTF8String]): GenericInternalRow = {
    val b = s.getBytes
    val n = b.length
    // distinct-set sizing: token count is unknown up front; 1 + n/8
    // (avg ≥7-char tokens) avoids most rehashing without over-allocating
    val seen = new java.util.HashSet[UTF8String](math.max(8, 1 + n / 8))
    var nTok = 0L
    var nStop = 0L
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || b(i) == ' ') {
        val tok = UTF8String.fromBytes(b, start, i - start)
        nTok += 1L
        seen.add(tok)
        if (stop.contains(tok)) nStop += 1L
        start = i + 1
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](
      nTok, seen.size.toLong, nStop, s.numChars().toLong))
  }

  /** SQL builder: `graft_token_stats(text[, stopwords])` with an
    * optional literal ARRAY<STRING> stopword list (e.g.
    * `graft_token_stats(text, array('a', 'the'))`). */
  private[graft] def build(children: Seq[Expression]): Expression = {
    require(children.nonEmpty && children.length <= 2,
      s"graft_token_stats requires (text[, stopwords]), got ${children.length} arguments")
    val stop: Seq[String] =
      if (children.length < 2) Nil
      else children(1) match {
        case e if e.foldable && (e.dataType match {
            case org.apache.spark.sql.types.ArrayType(StringType, _) => true
            case _ => false
          }) =>
          e.eval() match {
            case null => Nil
            case a: org.apache.spark.sql.catalyst.util.ArrayData =>
              a.toObjectArray(StringType).toSeq.map {
                case null => throw new IllegalArgumentException(
                  "graft_token_stats: null stopword")
                case v => v.toString
              }
          }
        case _ => throw new IllegalArgumentException(
          "graft_token_stats: stopwords must be an ARRAY<STRING> literal")
      }
    TokenStats(children.head, stop)
  }
}
