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
import java.math.BigInteger

/** Exact integer gram/covariance accumulator for embedding columns.
  *
  * Replaces the generate-2080-pairs-per-row + hash-aggregate plan for
  * `emb_covariance` (measured 4.7 s at sf0.1 → ~470 s extrapolated at
  * sf10: the per-row struct allocation and the corpus×pairs exploded
  * stream dominate). This aggregate keeps the SAME exact semantics —
  * elements quantize to integer micro-units with Spark's own
  * round-HALF_UP before any cross-row sum — but accumulates the
  * dim(dim+1)/2 upper-triangle products in a primitive long array per
  * partition, merging dim-bounded partials: zero corpus shuffle, no
  * exploded intermediate, O(dim²) memory.
  *
  * Overflow-proof at any corpus size: partials accumulate in long and
  * FOLD into BigInteger totals before a row could overflow them (the
  * fold threshold adapts to the largest |q| seen; a row whose own
  * product exceeds long range — |v| > ~2800 — takes the BigInteger
  * path directly). The final values are emitted as decimal(38,0), so
  * the downstream double casts see the same exact integers DuckDB's
  * HUGEINT sums produce.
  *
  * Input hygiene: a NULL vector is skipped (standard aggregate
  * null-semantics — a SQL oracle must count with count(v), not
  * count(*), if nullable embeddings ever appear); a ragged vector
  * (fewer than `dim` elements) throws rather than silently skewing
  * the denominators.
  */
case class GramMatrixAgg(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GramMatrixAgg.Buf] {

  import GramMatrixAgg._

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("sums", ArrayType(DecimalType(38, 0), containsNull = false),
      nullable = false),
    StructField("prods", ArrayType(DecimalType(38, 0), containsNull = false),
      nullable = false)))

  override def createAggregationBuffer(): Buf = new Buf(dim)

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      val a = v.asInstanceOf[ArrayData]
      // Fail FAST on a ragged vector: silently excluding it from n
      // while a SQL oracle's count(*) still counts the row would skew
      // every covariance denominator — make the divergence loud.
      if (a.numElements() < dim) {
        throw new IllegalArgumentException(
          s"gram_matrix: vector has ${a.numElements()} elements, needs >= $dim")
      } else {
        // quantize exactly like round(x * 1e6, 0).cast("long"):
        // double multiply, BigDecimal HALF_UP at scale 0, long cast
        val q = new Array[Long](dim)
        var maxAbs = 0L
        var i = 0
        while (i < dim) {
          val d = a.getDouble(i) * 1e6
          val r = java.math.BigDecimal.valueOf(d)
            .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong
          q(i) = r
          val ab = math.abs(r)
          if (ab > maxAbs) maxAbs = ab
          i += 1
        }
        buf.addRow(q, maxAbs)
      }
    }
    buf
  }

  override def merge(buf: Buf, other: Buf): Buf = { buf.mergeFrom(other); buf }

  override def eval(buf: Buf): Any = {
    buf.fold()
    val sums = new Array[Any](dim)
    val prods = new Array[Any](buf.nPairs)
    var i = 0
    while (i < dim) {
      sums(i) = Decimal(scala.math.BigDecimal(buf.bigSums(i)), 38, 0); i += 1
    }
    i = 0
    while (i < buf.nPairs) {
      prods(i) = Decimal(scala.math.BigDecimal(buf.bigProds(i)), 38, 0); i += 1
    }
    new GenericInternalRow(Array[Any](buf.n,
      new GenericArrayData(sums), new GenericArrayData(prods)))
  }

  override def serialize(buf: Buf): Array[Byte] = {
    buf.fold()
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.dim)
    out.writeLong(buf.n)
    def writeBig(arr: Array[BigInteger]): Unit = arr.foreach { b =>
      val bytes = b.toByteArray
      out.writeInt(bytes.length); out.write(bytes)
    }
    writeBig(buf.bigSums); writeBig(buf.bigProds)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val d = in.readInt()
    val buf = new Buf(d)
    buf.n = in.readLong()
    def readBig(arr: Array[BigInteger]): Unit = {
      var i = 0
      while (i < arr.length) {
        val len = in.readInt(); val b = new Array[Byte](len)
        in.readFully(b); arr(i) = new BigInteger(b); i += 1
      }
    }
    readBig(buf.bigSums); readBig(buf.bigProds)
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): GramMatrixAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): GramMatrixAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
  override def prettyName: String = "gram_matrix"
}

object GramMatrixAgg {

  /** Long partials + BigInteger totals. `addRow` folds the partials
    * into the totals before the next row could overflow a long cell;
    * the capacity is re-derived whenever a row raises the observed
    * max |q|. */
  final class Buf(val dim: Int) {
    val nPairs: Int = dim * (dim + 1) / 2
    var n: Long = 0L
    var sinceFold: Long = 0L
    private var maxSq: Long = 1L
    private var capacity: Long = Long.MaxValue / 2
    val partSums = new Array[Long](dim)
    val partProds = new Array[Long](nPairs)
    val bigSums: Array[BigInteger] = Array.fill(dim)(BigInteger.ZERO)
    val bigProds: Array[BigInteger] = Array.fill(nPairs)(BigInteger.ZERO)

    def addRow(q: Array[Long], maxAbs: Long): Unit = {
      n += 1
      if (maxAbs > 3000000000L) { addRowBig(q); return } // q² exceeds long
      val sq = maxAbs * maxAbs
      if (sq > maxSq) {
        maxSq = math.max(sq, 1L)
        capacity = (Long.MaxValue / 2) / maxSq
      }
      if (sinceFold >= capacity) fold()
      var k = 0
      var i = 0
      while (i < dim) {
        partSums(i) += q(i)
        val qi = q(i)
        var j = i
        while (j < dim) { partProds(k) += qi * q(j); j += 1; k += 1 }
        i += 1
      }
      sinceFold += 1
    }

    private def addRowBig(q: Array[Long]): Unit = {
      var k = 0
      var i = 0
      while (i < dim) {
        bigSums(i) = bigSums(i).add(BigInteger.valueOf(q(i)))
        var j = i
        while (j < dim) {
          bigProds(k) = bigProds(k).add(
            BigInteger.valueOf(q(i)).multiply(BigInteger.valueOf(q(j))))
          j += 1; k += 1
        }
        i += 1
      }
    }

    def fold(): Unit = {
      if (sinceFold == 0) return
      var i = 0
      while (i < dim) {
        if (partSums(i) != 0) {
          bigSums(i) = bigSums(i).add(BigInteger.valueOf(partSums(i)))
          partSums(i) = 0
        }
        i += 1
      }
      i = 0
      while (i < nPairs) {
        if (partProds(i) != 0) {
          bigProds(i) = bigProds(i).add(BigInteger.valueOf(partProds(i)))
          partProds(i) = 0
        }
        i += 1
      }
      sinceFold = 0
    }

    def mergeFrom(other: Buf): Unit = {
      fold(); other.fold()
      n += other.n
      var i = 0
      while (i < dim) { bigSums(i) = bigSums(i).add(other.bigSums(i)); i += 1 }
      i = 0
      while (i < nPairs) { bigProds(i) = bigProds(i).add(other.bigProds(i)); i += 1 }
    }
  }
}

object GramMatrix {
  /** struct(n, sums: array<decimal(38,0)> len dim, prods:
    * array<decimal(38,0)> len dim(dim+1)/2 upper-triangle row-major)
    * — exact micro-unit sums over the whole input. */
  def gram_matrix(vec: Column, dim: Int): Column =
    ExpressionUtils.column(
      GramMatrixAgg(ExpressionUtils.expression(vec), dim).toAggregateExpression())
}
