package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.graft.{Bridge => ExpressionUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

/** Misra-Gries heavy-hitters sketch as a TypedImperativeAggregate:
  * approximate top-key counts over a string column in fixed memory
  * (capacity k ⇒ any key with frequency > n/(k+1) is guaranteed
  * present; counts undercount by at most n/(k+1)). When k exceeds the
  * number of distinct keys the result is EXACT, which is what the
  * oracle query checks. Partial aggregation works map-side like any
  * built-in aggregate — the buffer is the k-entry map, serialized
  * compactly between stages.
  */
case class HeavyHittersAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.Map[String, Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = MapType(StringType, LongType, valueContainsNull = false)

  override def createAggregationBuffer(): mutable.Map[String, Long] =
    mutable.Map.empty[String, Long]

  override def update(buf: mutable.Map[String, Long], input: InternalRow): mutable.Map[String, Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[UTF8String].toString, 1L)
    buf
  }

  override def merge(buf: mutable.Map[String, Long],
                     other: mutable.Map[String, Long]): mutable.Map[String, Long] = {
    other.foreach { case (k, c) => add(buf, k, c) }
    buf
  }

  /** MG update generalized to weighted adds: insert or decrement-all. */
  private def add(buf: mutable.Map[String, Long], key: String, c: Long): Unit = {
    buf.get(key) match {
      case Some(cur) => buf(key) = cur + c
      case None if buf.size < capacity => buf(key) = c
      case None =>
        // decrement every counter by the smaller of c and the current
        // minimum until either c is absorbed or a slot frees up
        val dec = math.min(c, buf.values.min)
        var remaining = c - dec
        val dead = buf.iterator.collect { case (k, v) if v <= dec => k }.toList
        buf.mapValuesInPlace((_, v) => v - dec)
        dead.foreach(buf.remove)
        if (remaining > 0) add(buf, key, remaining)
    }
  }

  override def eval(buf: mutable.Map[String, Long]): Any = {
    val sorted = buf.toSeq.sortBy { case (k, v) => (-v, k) }
    new ArrayBasedMapData(
      new GenericArrayData(sorted.map(e => UTF8String.fromString(e._1)).toArray[Any]),
      new GenericArrayData(sorted.map(e => java.lang.Long.valueOf(e._2)).toArray[Any]))
  }

  override def serialize(buf: mutable.Map[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, v) => out.writeUTF(k); out.writeLong(v) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.Map[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.Map.empty[String, Long]
    (1 to n).foreach { _ => val k = in.readUTF(); buf(k) = in.readLong() }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): HeavyHittersAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HeavyHittersAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
  override def prettyName: String = "heavy_hitters"
}

object HeavyHitters {
  /** Column wrapper: map<key, approxCount> of the ≤capacity heaviest keys. */
  def heavy_hitters(c: Column, capacity: Int): Column =
    ExpressionUtils.column(
      HeavyHittersAgg(ExpressionUtils.expression(c), capacity).toAggregateExpression())
}
