package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.{Bridge => ExpressionUtils}
import org.apache.spark.sql.types._
import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

/** Sort-free per-group top-k: a bounded binary heap as a
  * TypedImperativeAggregate over struct<v: double, tie: long> rows,
  * keeping the k largest by (v DESC, tie ASC).
  *
  * Why not `row_number() OVER (...) ... WHERE rn <= k`: Spark plans
  * that as Sort → WindowGroupLimit(Partial) → Exchange → Sort →
  * WindowGroupLimit(Final) → Window. When groups are MANY and their
  * rows are SCATTERED (each map partition holds ≤k rows of any
  * group), the partial limit prunes nothing — but its map-side Sort
  * still sorts the ENTIRE input once, and the final window sorts it
  * again (measured on 15M rows / 1.5M groups: 19.1 s; with the
  * group-limit rule disabled, one sort: 7.6 s). This aggregate keeps
  * a k-bounded heap per group in a hash aggregate instead: NO sort at
  * any stage, map-side partials cap shuffle rows at k·|groups per
  * partition|, memory is k-bounded per group. At 100 TB that is the
  * difference between shuffling+sorting the fact table and a plain
  * hash aggregation.
  */
case class TopKDescAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKDescAgg.Heap] {

  import TopKDescAgg._

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)

  override def createAggregationBuffer(): Heap = new Heap(k)

  override def update(buf: Heap, input: InternalRow): Heap = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      buf.offer(row.getDouble(0), row.getLong(1))
    }
    buf
  }

  override def merge(buf: Heap, other: Heap): Heap = {
    var i = 0
    while (i < other.size) { buf.offer(other.vs(i), other.ties(i)); i += 1 }
    buf
  }

  override def eval(buf: Heap): Any = {
    val idx = (0 until buf.size).sortBy(i => (-buf.vs(i), buf.ties(i)))
    new GenericArrayData(idx.map(i =>
      InternalRow(buf.vs(i), buf.ties(i)): Any).toArray)
  }

  override def serialize(buf: Heap): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.k); out.writeInt(buf.size)
    var i = 0
    while (i < buf.size) { out.writeDouble(buf.vs(i)); out.writeLong(buf.ties(i)); i += 1 }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Heap = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val kk = in.readInt(); val n = in.readInt()
    val h = new Heap(kk)
    (1 to n).foreach(_ => h.offer(in.readDouble(), in.readLong()))
    h
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKDescAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKDescAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
  override def prettyName: String = "topk_desc"
}

object TopKDescAgg {

  /** Bounded min-heap on (v ASC, tie DESC) — the root is the WORST
    * kept entry, evicted when a better (v DESC, tie ASC) one arrives. */
  final class Heap(val k: Int) {
    val vs = new Array[Double](k)
    val ties = new Array[Long](k)
    var size = 0

    /** true when (v1,t1) orders BELOW (v2,t2) in keep-order, i.e. is
      * worse: smaller v, or equal v and larger tie. */
    private def worse(v1: Double, t1: Long, v2: Double, t2: Long): Boolean =
      v1 < v2 || (v1 == v2 && t1 > t2)

    def offer(v: Double, t: Long): Unit = {
      if (size < k) {
        var i = size
        vs(i) = v; ties(i) = t; size += 1
        // sift up (root = worst)
        while (i > 0 && worse(vs(i), ties(i), vs((i - 1) / 2), ties((i - 1) / 2))) {
          swap(i, (i - 1) / 2); i = (i - 1) / 2
        }
      } else if (worse(vs(0), ties(0), v, t)) {
        vs(0) = v; ties(0) = t
        // sift down
        var i = 0
        var done = false
        while (!done) {
          val l = 2 * i + 1; val r = 2 * i + 2
          var w = i
          if (l < size && worse(vs(l), ties(l), vs(w), ties(w))) w = l
          if (r < size && worse(vs(r), ties(r), vs(w), ties(w))) w = r
          if (w == i) done = true else { swap(i, w); i = w }
        }
      }
    }

    private def swap(a: Int, b: Int): Unit = {
      val v = vs(a); vs(a) = vs(b); vs(b) = v
      val t = ties(a); ties(a) = ties(b); ties(b) = t
    }
  }
}

object TopK {
  /** array<struct> of the k largest (v DESC, tie ASC) input structs —
    * `child` must be struct(doubleCol, longCol); output is sorted in
    * rank order so posexplode yields rank = pos + 1. */
  def topk_desc(child: Column, k: Int): Column =
    ExpressionUtils.column(
      TopKDescAgg(ExpressionUtils.expression(child), k).toAggregateExpression())
}
