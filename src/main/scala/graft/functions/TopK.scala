package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable

/** SpaceSaving heavy-hitters state: item → (count, error). While fewer
  * than `capacity` distinct items have been seen the counts are exact
  * (error 0); past capacity the classic Metwally et al. eviction keeps
  * per-item error ≤ the evicted minimum. */
final class SpaceSavingState(val capacity: Int) {
  val counts: mutable.HashMap[String, (Long, Long)] = mutable.HashMap.empty

  def add(item: String, inc: Long = 1L, err: Long = 0L): Unit =
    counts.get(item) match {
      case Some((c, e)) => counts.update(item, (c + inc, e + err))
      case None if counts.size < capacity => counts.update(item, (inc, err))
      case None =>
        val (minItem, (minC, _)) = counts.minBy { case (i, (c, _)) => (c, i) }
        counts.remove(minItem)
        counts.update(item, (minC + inc, minC + err))
    }

  def mergeIn(other: SpaceSavingState): Unit = {
    other.counts.foreach { case (i, (c, e)) => add(i, c, e) }
    // trim back to capacity, keeping the largest counts
    if (counts.size > capacity) {
      counts.toSeq.sortBy { case (i, (c, _)) => (-c, i) }
        .drop(capacity).foreach { case (i, _) => counts.remove(i) }
    }
  }
}

/** `heavy_hitters(expr, capacity, k)` — approximate top-k frequent
  * items as a native TypedImperativeAggregate (mutable sketch buffer,
  * map-side partial aggregation, binary-serialized between stages).
  * The 100 TB answer to "domain frequency list": memory is O(capacity)
  * per partition regardless of cardinality, vs a full groupBy's
  * shuffle of every distinct key. Exact (error=0) whenever the true
  * cardinality ≤ capacity. Returns array<struct<item,cnt,err>> sorted
  * by (cnt desc, item asc), truncated to k. */
case class HeavyHitters(
    child: Expression,
    capacity: Int,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingState] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = HeavyHitters.resultType

  override def createAggregationBuffer(): SpaceSavingState =
    new SpaceSavingState(capacity)

  override def update(buf: SpaceSavingState, row: InternalRow): SpaceSavingState = {
    val v = child.eval(row)
    if (v != null) buf.add(v.toString)
    buf
  }

  override def merge(buf: SpaceSavingState, other: SpaceSavingState): SpaceSavingState = {
    buf.mergeIn(other); buf
  }

  override def eval(buf: SpaceSavingState): Any = {
    val top = buf.counts.toSeq
      .sortBy { case (i, (c, _)) => (-c, i) }
      .take(k)
      .map { case (i, (c, e)) => InternalRow(UTF8String.fromString(i), c, e) }
    new GenericArrayData(top.toArray[Any])
  }

  override def serialize(buf: SpaceSavingState): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.capacity)
    out.writeInt(buf.counts.size)
    buf.counts.foreach { case (i, (c, e)) =>
      out.writeUTF(i); out.writeLong(c); out.writeLong(e)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): SpaceSavingState = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val st = new SpaceSavingState(in.readInt())
    val n = in.readInt()
    (0 until n).foreach { _ =>
      val i = in.readUTF(); val c = in.readLong(); val e = in.readLong()
      st.counts.update(i, (c, e))
    }
    st
  }

  override def withNewMutableAggBufferOffset(o: Int): HeavyHitters =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HeavyHitters =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): HeavyHitters =
    copy(child = cs.head)
}

object HeavyHitters {
  val resultType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)

  def heavyHitters(c: Column, capacity: Int, k: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      HeavyHitters(org.apache.spark.sql.graft.ColumnBridge.expression(c), capacity, k)
        .toAggregateExpression())
}
