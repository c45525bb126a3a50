package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Scale-plan proofs: bucketing eliminates the join shuffle; the
  * bucketized range join avoids the nested-loop plan. */
class BucketedJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("bucketed tables join with zero shuffle exchanges") {
    val dir = "/root/testdata/sf0.001"
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.load(spark, dir, "lineitem")
        .write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("li_bucketed")
      Tables.load(spark, dir, "orders")
        .write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("ord_bucketed")

      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))

      assert(joined.collect().map(_.getLong(1)).sum == 6000L)

      val plan = joined.queryExecution.executedPlan
      val inner = plan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val preAggShuffles = inner.collect { case e: ShuffleExchangeExec => e }
      // the ONLY exchange allowed is the final single-column group-by;
      // the join itself must consume bucket-partitioned scans directly
      assert(preAggShuffles.size <= 1,
        s"expected bucketed join without join-side shuffles, got:\n$inner")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }

  test("bucketized range join equals the naive theta join") {
    val points = (0 until 500).map(i => (i.toLong, i * 0.7)).toDF("id", "v")
    val ranges = Seq(("a", 0.0, 37.0), ("b", 37.0, 100.0), ("c", 100.0, 350.0),
      ("edge", 350.0, 350.0)) // empty interval must match nothing
      .toDF("name", "lo", "hi")
    val naive = points.join(ranges, col("v") >= col("lo") && col("v") < col("hi"))
      .select("id", "name").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val fast = RangeJoin.bucketed(points, "v", ranges, "lo", "hi", step = 40.0)
      .select("id", "name").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(fast == naive)
    assert(naive.nonEmpty && !naive.exists(_._2 == "edge"))
  }
}
