package graft

import graft.util.Checkpoints
import org.apache.spark.sql.functions._

/** Pins the measured-pin-statistics contract (r14 feature + the r15
  * ADVICE fixes): eager pins plan on their TRUE block-manager size,
  * inherited constraints survive the stats replacement, an EMPTY pin
  * is a valid small size (1 B) rather than unbroadcastable, and lazy
  * pins only lose their inherited estimate when AQE is there to
  * recover runtime broadcasts. */
class CheckpointStatsSpec extends SparkTestBase {

  private val MaxSize = BigInt(Long.MaxValue)

  test("eager pin plans on the measured block-manager size") {
    val df = spark.range(10000).select(
      col("id").as("k"), concat(lit("v" * 50), col("id").cast("string")).as("s"))
    val pinned = Checkpoints.pin(df)
    try {
      val size = pinned.queryExecution.optimizedPlan.stats.sizeInBytes
      assert(size > 0 && size < MaxSize, s"expected a measured size, got $size")
      // the measured value must be a real storage entry, not an estimate
      val stored = spark.sparkContext.getRDDStorageInfo
        .map(i => BigInt(i.memSize) + BigInt(i.diskSize))
      assert(stored.contains(size),
        s"sizeInBytes $size should be one of the stored block sizes ${stored.mkString(",")}")
    } finally Checkpoints.release(pinned)
  }

  // NOTE deliberately ABSENT: a "pin keeps inherited constraints" test.
  // Threading the origin constraint set through the stats rebuild was
  // tried and REVERTED — InferFiltersFromConstraints re-derived
  // kernel-priced predicates onto both sides of the MinHash self-joins
  // (idle-box sf10 A/B: dedup_minhash_oph 108.8 s / 2637 CPU-s with
  // constraints vs 75.9 s / 1285 CPU-s without; Bridge.measuredPinStats
  // scaladoc records it). Pins drop constraints by design.

  test("empty eager pin is a small valid size, never unbroadcastable") {
    val empty = spark.range(100).toDF("k").filter(col("k") < 0)
    val pinned = Checkpoints.pin(empty)
    try {
      val size = pinned.queryExecution.optimizedPlan.stats.sizeInBytes
      assert(size < MaxSize,
        s"an empty pin must stay statically broadcastable, got $size")
    } finally Checkpoints.release(pinned)
  }

  test("lazy pin keeps its inherited estimate when AQE is off") {
    val conf = spark.conf
    val oldAqe = conf.get("spark.sql.adaptive.enabled")
    try {
      conf.set("spark.sql.adaptive.enabled", "false")
      val lazyOff = Checkpoints.pinLazy(spark.range(1000).toDF("k"))
      val sizeOff = lazyOff.queryExecution.optimizedPlan.stats.sizeInBytes
      assert(sizeOff < MaxSize,
        s"without AQE the inherited estimate must survive (else every lazy-pin join degrades to SMJ), got $sizeOff")
      conf.set("spark.sql.adaptive.enabled", "true")
      val lazyOn = Checkpoints.pinLazy(spark.range(1000).toDF("k"))
      val sizeOn = lazyOn.queryExecution.optimizedPlan.stats.sizeInBytes
      assert(sizeOn == MaxSize,
        s"with AQE on, a lazy pin's unknowable size is stripped (AQE re-derives broadcasts), got $sizeOn")
    } finally conf.set("spark.sql.adaptive.enabled", oldAqe)
  }
}
