package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items ("heavy hitters") sketch as a one-pass
  * typed aggregate — the mergeable summary from Agarwal et al.,
  * "Mergeable Summaries" (PODS'12), over Misra & Gries (1982).
  *
  * Holds at most `capacity` counters. Guarantees, for a group of n
  * input rows:
  *  - every item with true frequency > n/(capacity+1) IS in the output
  *    (no false negatives above the threshold);
  *  - reported count ∈ [true − n/(capacity+1), true] (undercount only);
  *  - when the group's distinct-item count never exceeds `capacity`,
  *    no decrement ever fires and every count is EXACT — independent
  *    of partitioning or merge order.
  *
  * The merge (sum common counters, then subtract the (capacity+1)-th
  * largest count and drop non-positives) preserves both bounds under
  * any merge tree, so the aggregate is map-side combinable: each
  * partial exchanges O(capacity) entries — the 100 TB alternative to
  * shuffling every distinct token of a corpus to count the top ones.
  * (Spark ships count_min_sketch, which answers point queries but
  * cannot enumerate its heavy items without a second pass; this sketch
  * returns the item list directly.)
  *
  * Returns ARRAY<STRUCT<item STRING, est BIGINT>> sorted by
  * (est DESC, item ASC).
  */
case class FreqItemsAgg(
    child: Expression,
    capacity: Int = 64,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[UTF8String, java.lang.Long]]
  with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  require(capacity > 0, s"capacity must be positive, got $capacity")

  override def children: Seq[Expression] = Seq(child)
  // Analysis-time coercion: SQL calls over non-string columns (ints,
  // dates) cast to STRING instead of ClassCastException-ing in update().
  // (covariant Seq[DataType] — AbstractDataType itself is private[sql])
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("item", StringType), StructField("est", LongType))),
    containsNull = false)
  override def prettyName: String = "graft_freq_items"

  override def createAggregationBuffer(): java.util.HashMap[UTF8String, java.lang.Long] =
    new java.util.HashMap[UTF8String, java.lang.Long](capacity * 2)

  /** Decrement every counter by `by` (≥1), dropping non-positives —
    * the Misra-Gries eviction step, O(capacity) amortized over the
    * `by` arrivals that funded it. */
  private def decrementAll(buf: java.util.HashMap[UTF8String, java.lang.Long], by: Long): Unit = {
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue.longValue <= by) it.remove()
      else e.setValue(java.lang.Long.valueOf(e.getValue.longValue - by))
    }
  }

  override def update(buf: java.util.HashMap[UTF8String, java.lang.Long],
      input: InternalRow): java.util.HashMap[UTF8String, java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      // boxed values so a missing key is a real null, not an unboxed 0
      val cur = buf.get(s)
      if (cur != null) buf.put(s, java.lang.Long.valueOf(cur.longValue + 1L))
      else if (buf.size < capacity)
        // clone: the UTF8String may point into a reused unsafe-row
        // buffer; storing it un-copied corrupts the sketch
        buf.put(s.clone(), java.lang.Long.valueOf(1L))
      else decrementAll(buf, 1L)
    }
    buf
  }

  override def merge(buf: java.util.HashMap[UTF8String, java.lang.Long],
      other: java.util.HashMap[UTF8String, java.lang.Long]): java.util.HashMap[UTF8String, java.lang.Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = buf.get(e.getKey)
      // new keys (cur == null) come from a deserialized buffer whose
      // UTF8Strings own their bytes — clone only to keep the invariant
      // explicit if that ever changes
      buf.put(if (cur == null) e.getKey.clone() else e.getKey,
        java.lang.Long.valueOf((if (cur == null) 0L else cur.longValue) + e.getValue.longValue))
    }
    if (buf.size > capacity) {
      // subtract the (capacity+1)-th largest count; ≥ that many
      // counters reach ≤0 and drop, so ≤ capacity remain
      val counts = new Array[Long](buf.size)
      var i = 0
      val vit = buf.values().iterator()
      while (vit.hasNext) { counts(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(counts)
      decrementAll(buf, counts(buf.size - capacity - 1))
    }
    buf
  }

  override def eval(buf: java.util.HashMap[UTF8String, java.lang.Long]): Any = {
    val entries = new Array[(UTF8String, Long)](buf.size)
    var i = 0
    val it = buf.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); entries(i) = (e.getKey, e.getValue.longValue); i += 1 }
    val sorted = entries.sortWith { case ((ia, ca), (ib, cb)) =>
      if (ca != cb) ca > cb else ia.compareTo(ib) < 0
    }
    new GenericArrayData(sorted.map { case (item, est) =>
      InternalRow(item, est)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: java.util.HashMap[UTF8String, java.lang.Long]): Array[Byte] = {
    var size = 4
    val it0 = buf.keySet().iterator()
    while (it0.hasNext) size += 4 + it0.next().numBytes() + 8
    val bb = java.nio.ByteBuffer.allocate(size)
    bb.putInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val b = e.getKey.getBytes
      bb.putInt(b.length); bb.put(b); bb.putLong(e.getValue.longValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[UTF8String, java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      buf.put(UTF8String.fromBytes(b), java.lang.Long.valueOf(bb.getLong))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqItemsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqItemsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object FreqItemsAgg {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  /** Column API: heavy-hitter sketch of `value` with at most
    * `capacity` counters — ARRAY<STRUCT<item, est>> by est desc. */
  def freqItems(value: Column, capacity: Int = 64): Column =
    ColumnBridge.column(
      FreqItemsAgg(ColumnBridge.expression(value), capacity).toAggregateExpression())

  /** SQL builder: `graft_freq_items(value, capacity)` with a literal
    * capacity. */
  private[graft] def build(children: Seq[Expression]): Expression = {
    require(children.length == 2,
      s"graft_freq_items requires (value, capacity), got ${children.length} arguments")
    FreqItemsAgg(children(0), TopKAgg.foldableInt(children(1), "capacity"))
  }
}
