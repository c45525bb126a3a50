package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Signed-zero canonicalization of the verify contract.
  *
  * CORRECTNESS_r06's one red row (`emb_covariance`) was a single cell
  * that Spark emitted as `0.0` and the DuckDB oracle as `-0.0` —
  * value-equal, hash-different. Root cause: Spark's `round` (and any
  * `BigDecimal`-based rounding) has no signed zero, while DuckDB's
  * `round(x, 6)` preserves the sign of a negative value that rounds
  * to zero. Any of the ~190 rounded doubles in the inventory can hit
  * this whenever the regenerated corpus lands a value in (-5e-7, 0),
  * so instead of auditing sites one by one, BOTH sides of the verify
  * contract are canonicalized mechanically here:
  *
  *  - Spark side: [[normalizeNegZero]] maps `-0.0 → +0.0` on every
  *    float/double column — top-level, inside arrays, structs, and
  *    map values — via IEEE `x + 0.0` (identity for every other
  *    value including NaN; `-0.0 + 0.0 == +0.0`).
  *  - Oracle side: [[wrapOracleSql]] wraps the dumped DuckDB SQL in
  *    one outer SELECT applying `+ 0` to the same columns, using the
  *    Spark result schema (the schema gate already requires the two
  *    sides to agree column-for-column, so it is the right source of
  *    truth for which oracle columns are floating).
  *
  * This is a canonical-form choice, not a loosening: the compared
  * values are unchanged except that the two bit patterns of zero
  * collapse to one.
  */
object Canon {

  private def needsNorm(dt: DataType): Boolean = dt match {
    case DoubleType | FloatType => true
    case ArrayType(et, _)       => needsNorm(et)
    case st: StructType         => st.fields.exists(f => needsNorm(f.dataType))
    case MapType(_, vt, _)      => needsNorm(vt)
    case _                      => false
  }

  private def normCol(c: Column, dt: DataType): Column = dt match {
    case DoubleType => c + lit(0.0)
    case FloatType  => c + lit(0.0f)
    case ArrayType(et, _) if needsNorm(et) =>
      transform(c, x => normCol(x, et))
    case st: StructType if needsNorm(st) =>
      // guard: rebuilding via struct(getField…) would turn a NULL struct
      // into a non-NULL struct of NULLs; `when` without otherwise keeps it NULL
      when(c.isNotNull,
        struct(st.fields.map(f => normCol(c.getField(f.name), f.dataType).as(f.name)): _*))
    case MapType(_, vt, _) if needsNorm(vt) =>
      transform_values(c, (_, v) => normCol(v, vt))
    case _ => c
  }

  /** `-0.0 → +0.0` on every float/double in `df` (recursing into
    * arrays/structs/maps); all other values and the schema unchanged.
    */
  def normalizeNegZero(df: DataFrame): DataFrame = {
    if (!df.schema.fields.exists(f => needsNorm(f.dataType))) df
    else df.select(df.schema.fields.map { f =>
      val c = col("`" + f.name + "`")
      if (needsNorm(f.dataType)) normCol(c, f.dataType).as(f.name) else c
    }.toIndexedSeq: _*)
  }

  /** Wrap DuckDB oracle SQL so its float/double output columns get the
    * same `-0.0 → +0.0` canonicalization (`x + 0` is the IEEE-identity
    * trick again). `schema` is the Spark result schema for the same
    * query. Non-floating schemas return the SQL untouched. Nested
    * struct/map doubles are left alone (no oracled query emits them;
    * the Spark-side spec would catch one appearing).
    */
  def wrapOracleSql(sql: String, schema: StructType): String = {
    def ex(name: String, dt: DataType): Option[String] = dt match {
      case DoubleType => Some(s"($name + 0)")
      case FloatType  => Some(s"CAST($name + 0 AS FLOAT)")
      case ArrayType(DoubleType, _) =>
        Some(s"list_transform($name, __x -> __x + 0)")
      case ArrayType(FloatType, _) =>
        Some(s"list_transform($name, __x -> CAST(__x + 0 AS FLOAT))")
      case _ => None
    }
    val items = schema.fields.map { f =>
      val qn = "\"" + f.name.replace("\"", "\"\"") + "\""
      ex(qn, f.dataType).map(e => s"$e AS $qn").getOrElse(qn)
    }
    if (schema.fields.exists(f => ex("x", f.dataType).isDefined))
      s"SELECT ${items.mkString(", ")} FROM (\n$sql\n) __graft_canon"
    else sql
  }
}
