package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for every left row, the single right
  * row with the greatest right-ts ≤ left-ts within the same key group
  * (backward direction, inclusive) — DuckDB `ASOF JOIN` semantics.
  *
  * Spark has no native as-of join. A naive range join
  * (`l.ts >= r.ts` + window) explodes quadratically per key. This
  * implementation is the scalable union+window form:
  *
  *   1. tag right rows 0 / left rows 1 and union them;
  *   2. one shuffle: window partitioned by the keys, ordered by
  *      (ts, tag) — ties sort the right row first, making equal
  *      timestamps match (inclusive);
  *   3. `last(right payload, ignoreNulls)` over an unbounded-preceding
  *      running frame carries the latest right row forward;
  *   4. keep only left rows.
  *
  * Cost: ONE shuffle of |L|+|R| rows on the group keys + a linear
  * sorted scan per key — no row-pair blowup, skew bounded by the
  * hottest key (salt upstream if a key dominates). This is the plan
  * you'd want at 100 TB and it's all built-in operators, so AQE and
  * codegen apply.
  */
object AsOfJoin {

  /** @param keys      equi-join group columns (must exist both sides)
    * @param leftTs    left ordering column name
    * @param rightTs   right ordering column name
    * @param rightCols right payload columns to carry (renamed as-is in
    *                  the output; must not collide with left columns)
    */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String,
               rightCols: Seq[String]): DataFrame = {
    require(rightCols.nonEmpty, "need at least one right payload column")
    val leftCols = left.columns.toSeq

    val taggedRight = right.select(
      keys.map(col) ++
        Seq(col(rightTs).as("__ts"), lit(0).as("__tag")) ++
        leftCols.filterNot(keys.contains).map(c => lit(null).as(c)) ++
        rightCols.map(col): _*)
    val taggedLeft = left.select(
      keys.map(col) ++
        Seq(col(leftTs).as("__ts"), lit(1).as("__tag")) ++
        leftCols.filterNot(keys.contains).map(col) ++
        rightCols.map(c => lit(null).as(c)): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = rightCols.foldLeft(taggedRight.unionByName(taggedLeft)) {
      (df, c) => df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }

    carried.filter(col("__tag") === 1)
      .select(leftCols.map(col) ++ rightCols.map(col): _*)
  }
}
