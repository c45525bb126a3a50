package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.{Bridge => ExpressionUtils}
import org.apache.spark.sql.types._

/** Per-shingle-bucket pair emission with a hard frequency cap — the
  * single-shuffle replacement for the classic three-plan shape
  * `count per shingle → filter rare → re-join the shingle stream →
  * self-join on shingle`:
  *
  *   groupBy(shingle).agg(shingle_pairs(doc, set_size, cap))
  *
  * collects AT MOST cap (doc, set_size) members per shingle — one
  * insert past the cap flips the buffer to overflow and drops the
  * stored members, so state is cap-bounded no matter how boilerplate
  * a shingle is (the frequent-shingle blowup is exactly what the cap
  * exists to exclude). eval() emits the C(n,2) ordered pairs
  * (doc_a < doc_b) as array<struct>, or NULL for an overflowed or
  * single-member bucket (explode then drops the row for free).
  *
  * vs the join form at scale: ONE shuffle of the exploded shingle
  * stream instead of two (count + re-join) and ONE corpus
  * tokenize/shingle pass instead of two — the aggregation state adds
  * ≤ 16·cap bytes per in-flight group. Pair volume out is identical.
  *
  * Reference semantics this preserves: scratchdata delegates fuzzy
  * dedup entirely to its backends; the rare-shingle blocking contract
  * here is the repo's own (documents-table oracle, see
  * queries/TrainingOps "dedup_components" SQL twin).
  */
case class ShinglePairsAgg(
    doc: Expression,
    sz: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ShinglePairsAgg.Members] {

  import ShinglePairsAgg._

  override def children: Seq[Expression] = Seq(doc, sz)
  override def nullable: Boolean = true // overflow / singleton → null
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("doc_a", LongType, nullable = false),
    StructField("doc_b", LongType, nullable = false),
    StructField("size_a", LongType, nullable = false),
    StructField("size_b", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): Members = new Members(cap)

  // Bound-reference fast path (see TopKDescAgg): primitives straight
  // off the input row, no per-row boxing through eval().
  private[this] lazy val (dOrd, sOrd) = (doc, sz) match {
    case (bd: org.apache.spark.sql.catalyst.expressions.BoundReference,
          bs: org.apache.spark.sql.catalyst.expressions.BoundReference)
        if bd.dataType == LongType && bs.dataType == LongType =>
      (bd.ordinal, bs.ordinal)
    case _ => (-1, -1)
  }

  override def update(buf: Members, input: InternalRow): Members = {
    if (dOrd >= 0) {
      if (!input.isNullAt(dOrd) && !input.isNullAt(sOrd))
        buf.add(input.getLong(dOrd), input.getLong(sOrd))
    } else {
      val d = doc.eval(input)
      if (d != null) {
        val s = sz.eval(input)
        if (s != null) buf.add(d.asInstanceOf[Long], s.asInstanceOf[Long])
      }
    }
    buf
  }

  override def merge(buf: Members, other: Members): Members = {
    if (other.overflow) buf.overflow = true
    else {
      var i = 0
      while (i < other.n && !buf.overflow) {
        buf.add(other.docs(i), other.szs(i)); i += 1
      }
    }
    buf
  }

  override def eval(buf: Members): Any = {
    if (buf.overflow || buf.n < 2) return null
    val n = buf.n
    // order members by doc id so emitted pairs are (doc_a < doc_b);
    // n ≤ cap, insertion sort is fine
    val ds = java.util.Arrays.copyOf(buf.docs, n)
    val ss = java.util.Arrays.copyOf(buf.szs, n)
    var i = 1
    while (i < n) {
      val d = ds(i); val s = ss(i)
      var j = i - 1
      while (j >= 0 && ds(j) > d) { ds(j + 1) = ds(j); ss(j + 1) = ss(j); j -= 1 }
      ds(j + 1) = d; ss(j + 1) = s
      i += 1
    }
    val out = new Array[Any](n * (n - 1) / 2)
    var r = 0
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        out(r) = InternalRow(ds(i), ds(j), ss(i), ss(j))
        r += 1; j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Members): Array[Byte] = {
    if (buf.overflow) Array[Byte](1)
    else {
      val n = buf.n
      val arr = new Array[Byte](1 + 8 + 16 * n)
      val bb = java.nio.ByteBuffer.wrap(arr)
      bb.put(0: Byte); bb.putInt(buf.cap); bb.putInt(n)
      var i = 0
      while (i < n) { bb.putLong(buf.docs(i)); bb.putLong(buf.szs(i)); i += 1 }
      arr
    }
  }

  override def deserialize(bytes: Array[Byte]): Members = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    if (bb.get() != 0) { val m = new Members(cap); m.overflow = true; m }
    else {
      val m = new Members(bb.getInt())
      val n = bb.getInt()
      m.ensure(n)
      var i = 0
      while (i < n) { m.docs(i) = bb.getLong(); m.szs(i) = bb.getLong(); i += 1 }
      m.n = n
      m
    }
  }

  override def withNewMutableAggBufferOffset(offset: Int): ShinglePairsAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): ShinglePairsAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(doc = c(0), sz = c(1))
  override def prettyName: String = "shingle_pairs"
}

object ShinglePairsAgg {

  /** Cap-bounded (doc, set_size) member list; overflow drops storage.
    * Starts at 4 slots (the overwhelmingly common bucket has 1-2
    * members) and doubles up to cap. */
  final class Members(val cap: Int) {
    var docs = new Array[Long](math.min(4, math.max(1, cap)))
    var szs = new Array[Long](docs.length)
    var n = 0
    var overflow = false

    def ensure(m: Int): Unit = {
      if (m > docs.length) {
        val newLen = math.min(cap, math.max(m, docs.length * 2))
        docs = java.util.Arrays.copyOf(docs, newLen)
        szs = java.util.Arrays.copyOf(szs, newLen)
      }
    }

    def add(d: Long, s: Long): Unit = {
      if (overflow) return
      if (n == cap) { overflow = true; n = 0; return }
      ensure(n + 1)
      docs(n) = d; szs(n) = s; n += 1
    }
  }
}

object ShinglePairs {
  /** array<struct<doc_a,doc_b,size_a,size_b>> of all ordered member
    * pairs of the group, or NULL when the group exceeds `cap` members
    * (frequency-capped blocking) or has fewer than 2. `doc` and `sz`
    * must be long columns. */
  def shingle_pairs(doc: Column, sz: Column, cap: Int): Column =
    ExpressionUtils.column(
      ShinglePairsAgg(ExpressionUtils.expression(doc),
        ExpressionUtils.expression(sz), cap).toAggregateExpression())
}
