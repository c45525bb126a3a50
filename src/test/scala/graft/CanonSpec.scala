package graft

import graft.util.Canon
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The signed-zero canonicalization seam (r6's one red row was a
  * lone -0.0 cell): every float/double that can reach the verify
  * contract — top-level, array, struct, map value — must come out
  * +0.0, with every other value (incl. NaN, nulls) bit-identical.
  */
class CanonSpec extends SparkTestBase {
  import spark.implicits._

  private def isNegZero(d: Double): Boolean =
    java.lang.Double.doubleToRawLongBits(d) == java.lang.Double.doubleToRawLongBits(-0.0)

  test("normalizeNegZero: -0.0 → +0.0 in scalars, arrays, structs, maps; all else untouched") {
    val df = Seq(
      (-0.0, -0.0f, Seq(-0.0, 1.5, -2.5), ("x", -0.0), Map("k" -> -0.0)),
      (3.25, 1.25f, Seq(Double.NaN), ("y", 0.5), Map("k" -> 0.25))
    ).toDF("d", "f", "arr", "st", "m")
    val out = Canon.normalizeNegZero(df)
    // names/types preserved (nullability may loosen on rebuilt structs
    // — invisible to the driver's value compare)
    assert(out.schema.map(f => (f.name, f.dataType.simpleString)) ==
      df.schema.map(f => (f.name, f.dataType.simpleString)))
    val r0 = out.orderBy("d").head()
    assert(!isNegZero(r0.getDouble(0)) && r0.getDouble(0) == 0.0)
    assert(java.lang.Float.floatToRawIntBits(r0.getFloat(1)) ==
      java.lang.Float.floatToRawIntBits(0.0f))
    val arr = r0.getSeq[Double](2)
    assert(!isNegZero(arr.head) && arr(1) == 1.5 && arr(2) == -2.5)
    assert(!isNegZero(r0.getStruct(3).getDouble(1)))
    assert(!isNegZero(r0.getMap[String, Double](4)("k")))
    val r1 = out.orderBy("d").collect()(1)
    assert(r1.getDouble(0) == 3.25 && r1.getSeq[Double](2).head.isNaN)
  }

  test("normalizeNegZero is the identity plan for float-free schemas") {
    val df = Seq((1L, "a")).toDF("n", "s")
    assert(Canon.normalizeNegZero(df) eq df)
  }

  test("wrapOracleSql wraps only floating columns and leaves others alone") {
    val schema = StructType(Seq(
      StructField("i", LongType), StructField("cov", DoubleType),
      StructField("v", ArrayType(DoubleType))))
    val wrapped = Canon.wrapOracleSql("SELECT 1 AS i", schema)
    assert(wrapped.contains("""("cov" + 0) AS "cov""""))
    assert(wrapped.contains("""list_transform("v", __x -> __x + 0) AS "v""""))
    assert(wrapped.contains(""""i","""))
    assert(wrapped.contains("__graft_canon"))
    val intOnly = StructType(Seq(StructField("i", LongType)))
    assert(Canon.wrapOracleSql("SELECT 1 AS i", intOnly) == "SELECT 1 AS i")
  }

  test("a deliberate -0.0 emitter comes out of the verify path clean") {
    // Simulates the emb_covariance failure class end-to-end on the
    // Spark side: a query whose arithmetic yields -0.0.
    val df = spark.range(3).select((col("id") * lit(-0.0)).as("z"))
    val vals = Canon.normalizeNegZero(df).collect().map(_.getDouble(0))
    assert(vals.forall(v => !isNegZero(v)))
  }
}
