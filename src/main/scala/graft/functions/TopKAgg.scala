package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded per-group top-k as a one-pass mergeable typed aggregate —
  * the 100 TB replacement for the rank-window idiom.
  *
  * `row_number() OVER (PARTITION BY g ORDER BY score DESC) <= k`
  * shuffles and SORTS every row of every group to keep k of them. This
  * aggregate keeps a k-element heap per group instead: partial state
  * is O(k), map-side combine runs before the exchange (the shuffle
  * carries |groups|·k entries, not |rows|), and the merge (pour one
  * heap into the other, evicting the worst) is associative and
  * commutative — exact under any partitioning or merge tree, not an
  * approximation.
  *
  * Ordering contract: rows rank by (score DESC, id ASC) — the id is a
  * REQUIRED unique tiebreaker, which is the same §7.3 determinism rule
  * the declared window queries follow. Ties collapse only if two rows
  * share BOTH score and id (then they are the same logical row).
  *
  * Returns ARRAY<STRUCT<id BIGINT, score DOUBLE>> sorted by
  * (score DESC, id ASC) — position in the array is the rank.
  */
case class TopKAgg(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[(Double, Long)]]
  with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  require(k > 0, s"k must be positive, got $k")

  override def children: Seq[Expression] = Seq(score, id)
  // Analysis-time coercion so the SQL path (graft_top_k over DECIMAL /
  // INT columns) casts instead of ClassCastException-ing at execution;
  // the Column API's explicit casts become no-ops under this.
  // (covariant Seq[DataType] — AbstractDataType itself is private[sql])
  override def inputTypes: Seq[DataType] = Seq(DoubleType, LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("id", LongType), StructField("score", DoubleType))),
    containsNull = false)
  override def prettyName: String = "graft_top_k"

  // static serializable comparator (an inline anonymous class would
  // make the whole Expression unserializable for task shipping)
  private def worstFirst = TopKAgg.WorstFirst

  override def createAggregationBuffer(): java.util.TreeSet[(Double, Long)] =
    new java.util.TreeSet[(Double, Long)](worstFirst)

  private def offer(buf: java.util.TreeSet[(Double, Long)], e: (Double, Long)): Unit = {
    if (buf.size < k) { buf.add(e); () }
    else if (worstFirst.compare(e, buf.first()) > 0) {
      // better than the current worst: insert FIRST, and only evict if
      // the insert actually grew the set. (compare > 0 means e sorts
      // LATER in worst-first order, i.e. e is the better row.) The
      // reverse order — evict, then add — shrinks the buffer forever
      // when e is a duplicate of a resident element, losing a
      // legitimate k-th entry (KernelLawSpec caught exactly that).
      if (buf.add(e)) { buf.pollFirst(); () }
    }
  }

  override def update(buf: java.util.TreeSet[(Double, Long)],
      input: InternalRow): java.util.TreeSet[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      offer(buf, (s.asInstanceOf[Double], i.asInstanceOf[Long]))
    buf
  }

  override def merge(buf: java.util.TreeSet[(Double, Long)],
      other: java.util.TreeSet[(Double, Long)]): java.util.TreeSet[(Double, Long)] = {
    val it = other.iterator()
    while (it.hasNext) offer(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[(Double, Long)]): Any = {
    // descendingIterator yields best-first: (score DESC, id ASC)
    val out = new Array[Any](buf.size)
    val it = buf.descendingIterator()
    var i = 0
    while (it.hasNext) {
      val (s, id0) = it.next()
      out(i) = InternalRow(id0, s)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[(Double, Long)]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) { val (s, i) = it.next(); bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[(Double, Long)] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add((bb.getDouble, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKAgg {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  /** Literal-int argument of a SQL builder (shared by the graft
    * aggregate builders). */
  private[graft] def foldableInt(e: Expression, name: String): Int = e match {
    case other if other.foldable =>
      other.eval() match {
        case i: Int => i
        case l: Long => l.toInt
        case v => throw new IllegalArgumentException(
          s"$name must be an integer literal, got $v")
      }
    case _ => throw new IllegalArgumentException(s"$name must be a literal")
  }

  /** SQL builder: `graft_top_k(score, id, k)` with a literal k. */
  private[graft] def build(children: Seq[Expression]): Expression = {
    require(children.length == 3,
      s"graft_top_k requires (score, id, k), got ${children.length} arguments")
    TopKAgg(children(0), children(1), foldableInt(children(2), "k"))
  }

  /** TreeSet order, worst-first: (score ASC, id DESC), so `first()` is
    * the eviction candidate and insertion/eviction are O(log k). */
  object WorstFirst extends java.util.Comparator[(Double, Long)] with Serializable {
    override def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val c = java.lang.Double.compare(a._1, b._1)
      if (c != 0) c else java.lang.Long.compare(b._2, a._2)
    }
  }

  /** Column API: exact top-`k` (id, score) rows of the group by
    * (score DESC, id ASC). `id` must be unique within a group. */
  def topK(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(
      TopKAgg(ColumnBridge.expression(score.cast("double")),
        ColumnBridge.expression(id.cast("bigint")), k).toAggregateExpression())
}
