package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.{Bridge => ExpressionUtils}
import org.apache.spark.sql.types._
import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

/** Exact per-dimension micro-unit vector sum — the grouped sibling of
  * [[GramMatrixAgg]] (same quantization, first moment only).
  *
  * Replaces the `posexplode` → groupBy(group, pos) plan every
  * vector-mean consumer (k-means Lloyd updates, chunk→doc mean
  * pooling, corpus centroids) previously ran: that shape inflates the
  * corpus dim× BEFORE the partial aggregate — at embedding dims in the
  * hundreds, the generate + per-element hash-aggregate machinery
  * dominates (the same scale bug the covariance rewrite measured at
  * 4.7 s → ~470 s extrapolated sf10). This aggregate accumulates one
  * primitive long[dim] per group in a single pass, merges dim-bounded
  * partials, and keeps the SAME exact semantics: elements quantize
  * with Spark's own round-HALF_UP to integer micro-units before any
  * cross-row sum, so any engine lands on identical bits.
  *
  * Sum cells add with Math.addExact — at micro-unit scale (|q| ≈ 1e6
  * for unit-normalized embeddings) a long cell holds ~9e12 rows per
  * GROUP before overflow; past that it fails as loudly as Spark's
  * ANSI sum(long) would have.
  *
  * Input hygiene matches gram_matrix: a NULL vector is skipped (not
  * counted in n); a NULL element contributes nothing to its dimension
  * but the row still counts; a vector with fewer than `dim` elements
  * throws rather than silently skewing per-dimension denominators.
  *
  * Output: struct(n long, sums array<long> length dim).
  */
case class VecSumAgg(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VecSumAgg.Buf] {

  import VecSumAgg._

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("sums", ArrayType(LongType, containsNull = false),
      nullable = false)))

  override def createAggregationBuffer(): Buf = new Buf(dim)

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      val a = v.asInstanceOf[ArrayData]
      if (a.numElements() < dim) {
        throw new IllegalArgumentException(
          s"vec_sum_q: vector has ${a.numElements()} elements, needs >= $dim")
      }
      buf.n += 1
      var i = 0
      while (i < dim) {
        if (!a.isNullAt(i)) {
          // quantize exactly like round(x * 1e6, 0).cast("long"):
          // double multiply, BigDecimal HALF_UP at scale 0, long cast
          val d = a.getDouble(i) * 1e6
          val q = java.math.BigDecimal.valueOf(d)
            .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong
          buf.sums(i) = Math.addExact(buf.sums(i), q)
        }
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Buf, other: Buf): Buf = {
    buf.n += other.n
    var i = 0
    while (i < dim) {
      buf.sums(i) = Math.addExact(buf.sums(i), other.sums(i)); i += 1
    }
    buf
  }

  override def eval(buf: Buf): Any = {
    val out = new Array[Any](dim)
    var i = 0
    while (i < dim) { out(i) = buf.sums(i); i += 1 }
    new GenericInternalRow(Array[Any](buf.n, new GenericArrayData(out)))
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream(8 * (dim + 2))
    val out = new DataOutputStream(bos)
    out.writeInt(buf.sums.length)
    out.writeLong(buf.n)
    var i = 0
    while (i < buf.sums.length) { out.writeLong(buf.sums(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val d = in.readInt()
    val buf = new Buf(d)
    buf.n = in.readLong()
    var i = 0
    while (i < d) { buf.sums(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): VecSumAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): VecSumAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
  override def prettyName: String = "vec_sum_q"
}

object VecSumAgg {
  final class Buf(dim: Int) {
    var n: Long = 0L
    val sums = new Array[Long](dim)
  }
}

object VecSum {
  /** struct(n, sums: array<long> len dim) — exact micro-unit
    * (round(x·1e6) HALF_UP) per-dimension sums over the group. */
  def vec_sum_q(vec: Column, dim: Int): Column =
    ExpressionUtils.column(
      VecSumAgg(ExpressionUtils.expression(vec), dim).toAggregateExpression())
}
