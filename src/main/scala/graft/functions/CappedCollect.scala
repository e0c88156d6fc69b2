package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import scala.collection.mutable

/** Bounded buffer of the `cap` smallest longs seen (max-heap eviction:
  * O(log cap) per update, O(cap) memory regardless of group size). */
final class CappedMinSet(val cap: Int) {
  val heap: mutable.PriorityQueue[Long] = mutable.PriorityQueue.empty[Long]

  def add(v: Long): Unit =
    if (heap.size < cap) heap.enqueue(v)
    else if (v < heap.head) { heap.dequeue(); heap.enqueue(v) }

  def sortedAsc: Array[Long] = heap.toArray.sorted
}

/** `capped_sorted_ids(id, cap)` — the `cap` smallest ids of the group,
  * ascending, as a native TypedImperativeAggregate.
  *
  * This is the LSH hot-bucket cap executed in ONE aggregation pass:
  * semantically identical to `row_number() over (partition by bucket
  * order by id) <= cap` followed by `sort_array(collect_list(id))`, but
  * with no window sort, no second sizing pass, and a buffer that stays
  * O(cap) even when an identical-content flood lands millions of rows
  * in one bucket — map-side partials shrink the flood before the
  * shuffle, and merge keeps only the smallest `cap` across partials. */
case class CappedSortedIds(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CappedMinSet] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): CappedMinSet = new CappedMinSet(cap)

  override def update(buf: CappedMinSet, row: InternalRow): CappedMinSet = {
    val v = child.eval(row)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: CappedMinSet, other: CappedMinSet): CappedMinSet = {
    other.heap.foreach(buf.add)
    buf
  }

  override def eval(buf: CappedMinSet): Any = new GenericArrayData(buf.sortedAsc)

  override def serialize(buf: CappedMinSet): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.cap)
    out.writeInt(buf.heap.size)
    buf.heap.foreach(out.writeLong)
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): CappedMinSet = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val st = new CappedMinSet(in.readInt())
    val n = in.readInt()
    (0 until n).foreach(_ => st.add(in.readLong()))
    st
  }

  override def withNewMutableAggBufferOffset(o: Int): CappedSortedIds =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CappedSortedIds =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): CappedSortedIds =
    copy(child = cs.head)
}

object CappedSortedIds {
  def cappedSortedIds(c: Column, cap: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      CappedSortedIds(org.apache.spark.sql.graft.ColumnBridge.expression(c), cap)
        .toAggregateExpression())
}

/** Bounded DISTINCT-minima buffer: the `cap` smallest distinct longs
  * seen (sorted set, O(log cap) per update, O(cap) memory). Unlike
  * [[CappedMinSet]] a re-arriving value is a no-op, which makes the
  * aggregate duplicate-INSENSITIVE — the KMV/theta-sketch property
  * that lets a stream maintain it with no dedup state upstream. */
final class CappedDistinctMinSet(val cap: Int) {
  val set: mutable.TreeSet[Long] = mutable.TreeSet.empty[Long]

  def add(v: Long): Unit =
    if (set.size < cap) set += v
    else if (v < set.last && !set.contains(v)) { set -= set.last; set += v }

  def sortedAsc: Array[Long] = set.toArray
}

/** `capped_distinct_mins(v, cap)` — the `cap` smallest DISTINCT values
  * of the group, ascending: the KMV (k-minimum-values) distinct
  * sketch as ONE native aggregation pass. Duplicate-insensitive and
  * mergeable (merge = union then re-cap), so map-side partials, the
  * final merge, and a streaming Update-mode state store all hold the
  * same O(cap) buffer — the shape that carries a per-key distinct
  * sketch over a 100 TB stream with K longs of state per key. */
case class CappedDistinctMins(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CappedDistinctMinSet] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): CappedDistinctMinSet =
    new CappedDistinctMinSet(cap)

  override def update(buf: CappedDistinctMinSet, row: InternalRow): CappedDistinctMinSet = {
    val v = child.eval(row)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: CappedDistinctMinSet, other: CappedDistinctMinSet): CappedDistinctMinSet = {
    other.set.foreach(buf.add)
    buf
  }

  override def eval(buf: CappedDistinctMinSet): Any =
    new GenericArrayData(buf.sortedAsc)

  override def serialize(buf: CappedDistinctMinSet): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.cap)
    out.writeInt(buf.set.size)
    buf.set.foreach(out.writeLong)
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): CappedDistinctMinSet = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val st = new CappedDistinctMinSet(in.readInt())
    val n = in.readInt()
    (0 until n).foreach(_ => st.add(in.readLong()))
    st
  }

  override def withNewMutableAggBufferOffset(o: Int): CappedDistinctMins =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CappedDistinctMins =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): CappedDistinctMins =
    copy(child = cs.head)
}

object CappedDistinctMins {
  def cappedDistinctMins(c: Column, cap: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      CappedDistinctMins(org.apache.spark.sql.graft.ColumnBridge.expression(c), cap)
        .toAggregateExpression())
}
