package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join: match point values to [lo, hi) intervals.
  * Spark plans the naive `p >= lo AND p < hi` theta join as a
  * broadcast-nested-loop — O(|points|·|ranges|) comparisons. The
  * bucketized form turns it into an equi-join: points key on
  * floor(p/step); each interval explodes to the buckets it overlaps;
  * the bucket equi-join shuffles hash-partitioned and a residual
  * filter removes edge misses. With step ≈ median interval width the
  * fan-out is O(1) per interval, so cost is ~|points| + |ranges| —
  * the plan that survives 100 TB.
  */
object RangeJoin {

  /** @param points   DataFrame with a numeric point column
    * @param pointCol point column name
    * @param ranges   DataFrame with numeric [loCol, hiCol) bounds
    * @param step     bucket width (pick ≈ typical interval width)
    */
  def bucketed(points: DataFrame, pointCol: String,
               ranges: DataFrame, loCol: String, hiCol: String,
               step: Double): DataFrame = {
    require(step > 0)
    val p = points.withColumn("__bucket", floor(col(pointCol) / step).cast("long"))
    val r = ranges.withColumn("__bucket",
      explode(sequence(
        floor(col(loCol) / step).cast("long"),
        // hi is exclusive: a range ending exactly on a bucket boundary
        // does not reach into that bucket
        floor((col(hiCol) - lit(1e-9)) / step).cast("long"))))
    p.join(r, Seq("__bucket"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__bucket")
  }
}
