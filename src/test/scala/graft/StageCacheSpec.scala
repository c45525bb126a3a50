package graft

import graft.util.StageCache
import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

/** StageCache is the once-per-sweep shared-intermediate seam for
  * multi-consumer pipeline stages; these guards pin its contract:
  * compute-once, byte-stable read-back, an explicit shared location
  * for multi-node clusters, and a clean bypass. */
class StageCacheSpec extends SparkTestBase {

  test("stage builds once; every later caller reads the materialized parquet") {
    val builds = new AtomicInteger(0)
    def stage = {
      builds.incrementAndGet()
      spark.range(100).selectExpr("id", "id * 2 AS v")
    }
    val key = s"spec-once-${System.nanoTime()}"
    val a = StageCache.materialize(spark, key)(stage).collect().sortBy(_.getLong(0))
    val b = StageCache.materialize(spark, key)(stage).collect().sortBy(_.getLong(0))
    assert(builds.get() == 1, "stage must compute at most once per JVM")
    assert(a.toSeq == b.toSeq)
    assert(a.length == 100)
  }

  test("graft.stageCache.dir relocates the materialization (the multi-node shared-FS seam)") {
    val dir = Files.createTempDirectory("stage-cache-spec-").toString
    val key = s"spec-dir-${System.nanoTime()}"
    spark.conf.set("graft.stageCache.dir", dir)
    try {
      StageCache.materialize(spark, key)(spark.range(5).toDF()).collect()
      val out = new java.io.File(s"$dir/$key")
      assert(out.isDirectory && out.listFiles().exists(_.getName.endsWith(".parquet")),
        s"stage parquet must land under graft.stageCache.dir: $dir")
    } finally spark.conf.unset("graft.stageCache.dir")
  }

  test("graft.stageCache.enabled=false computes inline, writing nothing") {
    val builds = new AtomicInteger(0)
    def stage = { builds.incrementAndGet(); spark.range(3).toDF() }
    val key = s"spec-off-${System.nanoTime()}"
    spark.conf.set("graft.stageCache.enabled", "false")
    try {
      StageCache.materialize(spark, key)(stage).collect()
      StageCache.materialize(spark, key)(stage).collect()
      assert(builds.get() == 2, "disabled cache must compute per call")
    } finally spark.conf.unset("graft.stageCache.enabled")
  }
}
