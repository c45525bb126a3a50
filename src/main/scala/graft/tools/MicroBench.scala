package graft.tools

import graft.functions.NativeExpressions
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Dev scratch: time NearDupBlock.eval outside Spark's operators to
  * isolate expression cost from plan machinery. Not part of the
  * library surface. */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 20000
    val dim = 64
    val chunks = 32
    val rnd = new java.util.Random(7)
    val vecs = Array.fill(n)(Array.fill(dim)(rnd.nextDouble() - 0.5))
    def pack(idx: Seq[Int]) = new GenericArrayData(
      idx.map(i => InternalRow(i.toLong, new GenericArrayData(vecs(i)))).toArray[Any])
    val packed = pack(0 until n)

    val arrTy = ArrayType(StructType(Seq(
      StructField("__id", LongType), StructField("__v", ArrayType(DoubleType)))))
    val expr = NativeExpressions.NearDupBlock(
      BoundReference(0, arrTy, nullable = false),
      BoundReference(1, arrTy, nullable = false), 0.35)

    val t0 = System.nanoTime()
    var found = 0L
    (0 until chunks).foreach { c =>
      val chunk = pack((0 until n).filter(_ % chunks == c))
      val out = expr.eval(InternalRow(packed, chunk)).asInstanceOf[GenericArrayData]
      found += out.numElements()
    }
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"single-thread: n=$n pairs=${n.toLong*n/2} found=$found in $dt%.2f s " +
      f"(${n.toLong*n/2/dt/1e6}%.1f Mpairs/s)")
  }
}
