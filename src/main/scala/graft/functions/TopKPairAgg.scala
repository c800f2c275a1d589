package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** [[TopKAgg]] with a PAIR payload: bounded per-group top-k of
  * (id1, id2, score) rows ranked by (score DESC, id1 ASC, id2 ASC) —
  * the one-pass mergeable replacement for the rank-window idiom over
  * a PAIR space (`row_number() OVER (PARTITION BY g ORDER BY score
  * DESC, id1, id2) <= k`), where the window must SORT every generated
  * pair of every group (Σ|group|² rows) to keep k of them. Same
  * k-heap contract as TopKAgg: O(k) partial state, map-side combine,
  * associative+commutative merge — exact under any partitioning or
  * merge tree. The (id1, id2) pair is the required unique tiebreaker
  * (pairs are generated with id1 < id2, so a pair occurs once).
  *
  * Returns ARRAY<STRUCT<id1 BIGINT, id2 BIGINT, score DOUBLE>> sorted
  * by (score DESC, id1 ASC, id2 ASC) — position in the array is the
  * rank.
  *
  * Null contract: an input row whose score OR either id is null is
  * SKIPPED — it never enters the heap. This is a deliberate semantic
  * NARROWING vs the rank window it replaces: `row_number() OVER
  * (ORDER BY score DESC)` puts nulls LAST (Spark default), so a group
  * with fewer than k non-null-score pairs plus null-score pairs would
  * emit the null rows at the tail ranks, where this aggregate emits
  * fewer than k rows. Callers replacing a rank window must either
  * guarantee non-null inputs (q_embed_label_topk's cosine is non-null
  * by construction: the dot kernel and the norm product are evaluated
  * over non-null vectors, so the division yields a number — a
  * zero-norm operand gives NaN, which Double.compare ranks first,
  * exactly where the window's NaN-greatest ordering put it) or accept
  * the shorter result. Same contract as [[TopKAgg]].
  */
case class TopKPairAgg(
    score: Expression,
    id1: Expression,
    id2: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[(Double, Long, Long)]]
  with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  require(k > 0, s"k must be positive, got $k")

  override def children: Seq[Expression] = Seq(score, id1, id2)
  override def inputTypes: Seq[DataType] = Seq(DoubleType, LongType, LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("id1", LongType), StructField("id2", LongType),
      StructField("score", DoubleType))),
    containsNull = false)
  override def prettyName: String = "graft_top_k_pairs"

  private def worstFirst = TopKPairAgg.WorstFirst

  override def createAggregationBuffer(): java.util.TreeSet[(Double, Long, Long)] =
    new java.util.TreeSet[(Double, Long, Long)](worstFirst)

  private def offer(buf: java.util.TreeSet[(Double, Long, Long)],
      e: (Double, Long, Long)): Unit = {
    if (buf.size < k) { buf.add(e); () }
    else if (worstFirst.compare(e, buf.first()) > 0) {
      // insert FIRST, evict only if the set grew — the same
      // duplicate-eviction hazard TopKAgg's KernelLawSpec caught
      if (buf.add(e)) { buf.pollFirst(); () }
    }
  }

  override def update(buf: java.util.TreeSet[(Double, Long, Long)],
      input: InternalRow): java.util.TreeSet[(Double, Long, Long)] = {
    val s = score.eval(input)
    val a = id1.eval(input)
    val b = id2.eval(input)
    if (s != null && a != null && b != null)
      offer(buf, (s.asInstanceOf[Double], a.asInstanceOf[Long], b.asInstanceOf[Long]))
    buf
  }

  override def merge(buf: java.util.TreeSet[(Double, Long, Long)],
      other: java.util.TreeSet[(Double, Long, Long)]): java.util.TreeSet[(Double, Long, Long)] = {
    val it = other.iterator()
    while (it.hasNext) offer(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[(Double, Long, Long)]): Any = {
    // descendingIterator yields best-first: (score DESC, id1 ASC, id2 ASC)
    val out = new Array[Any](buf.size)
    val it = buf.descendingIterator()
    var i = 0
    while (it.hasNext) {
      val (s, a, b) = it.next()
      out(i) = InternalRow(a, b, s)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[(Double, Long, Long)]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 24)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) {
      val (s, a, b) = it.next(); bb.putDouble(s); bb.putLong(a); bb.putLong(b)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[(Double, Long, Long)] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add((bb.getDouble, bb.getLong, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id1 = newChildren(1), id2 = newChildren(2))
}

object TopKPairAgg {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  /** SQL builder: `graft_top_k_pairs(score, id1, id2, k)`, literal k. */
  private[graft] def build(children: Seq[Expression]): Expression = {
    require(children.length == 4,
      s"graft_top_k_pairs requires (score, id1, id2, k), got ${children.length} arguments")
    TopKPairAgg(children(0), children(1), children(2),
      TopKAgg.foldableInt(children(3), "k"))
  }

  /** TreeSet order, worst-first: (score ASC, id1 DESC, id2 DESC), so
    * `first()` is the eviction candidate. */
  object WorstFirst extends java.util.Comparator[(Double, Long, Long)] with Serializable {
    override def compare(a: (Double, Long, Long), b: (Double, Long, Long)): Int = {
      val c = java.lang.Double.compare(a._1, b._1)
      if (c != 0) return c
      val c1 = java.lang.Long.compare(b._2, a._2)
      if (c1 != 0) c1 else java.lang.Long.compare(b._3, a._3)
    }
  }

  /** Column API: exact top-`k` (id1, id2, score) rows of the group by
    * (score DESC, id1 ASC, id2 ASC). (id1, id2) must be unique within
    * a group. */
  def topKPairs(score: Column, id1: Column, id2: Column, k: Int): Column =
    ColumnBridge.column(
      TopKPairAgg(ColumnBridge.expression(score.cast("double")),
        ColumnBridge.expression(id1.cast("bigint")),
        ColumnBridge.expression(id2.cast("bigint")), k).toAggregateExpression())
}
