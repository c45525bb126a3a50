package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins. AQE's skew-join splitting covers
  * sort-merge joins at runtime; explicit salting is the deterministic
  * plan-level tool when one join key dominates (the classic hot-user /
  * hot-document problem at 100 TB): the fact side spreads each key
  * over `buckets` salt values, the dimension side replicates per salt,
  * and the join key becomes (key, salt) — no reducer sees more than
  * 1/buckets of a hot key.
  */
object Skew {

  /** Equi-join `left` (large, possibly skewed) with `right` (smaller,
    * replicated ×buckets) on `key`. Result equals a plain inner join.
    * Left salt is derived from the full row hash — deterministic under
    * retries, uniform within each key group. */
  def saltedEquiJoin(left: DataFrame, right: DataFrame, key: String,
                     buckets: Int): DataFrame = {
    require(buckets > 0)
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(struct(left.columns.map(col).toIndexedSeq: _*)), lit(buckets.toLong)))
    val saltedRight = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(buckets.toLong - 1))))
    saltedLeft.join(saltedRight, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase aggregation for combinable aggregates whose state does
    * not reduce map-side (e.g. exact count-distinct per key): phase 1
    * aggregates (key, salt), phase 2 merges per key. For plain
    * sum/count/min/max, HashAggregate's partial mode already does
    * this — use salting only when the partial state itself is the
    * problem. */
  def saltedCountDistinct(df: DataFrame, key: String, valueCol: String,
                          buckets: Int): DataFrame = {
    val salted = df.withColumn("__salt", pmod(xxhash64(col(valueCol)), lit(buckets.toLong)))
    // same value always lands in the same salt bucket → bucket-local
    // distinct counts add up to the exact global distinct count
    salted.groupBy(col(key), col("__salt"))
      .agg(countDistinct(col(valueCol)).as("__partial"))
      .groupBy(col(key))
      .agg(sum("__partial").as("n_distinct"))
  }
}
