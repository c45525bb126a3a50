package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable.ArrayBuffer

/** Dev scratch: per-stage attribution for ONE named query — where the
  * wall goes when a query's single-JVM vs multi-executor gap needs a
  * mechanism, not a guess. Prints each completed stage's task-time
  * sum, serialization-relevant byte counters, and peak task count.
  *
  * Usage: [SPARK_GRAFT_MASTER=...] runMain graft.tools.StageProbe <query> <sfDir>
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    graft.util.LauncherCheck.assertModuleOpens()
    val qname = if (args.nonEmpty) args(0) else "dedup_incremental"
    val sfDir = if (args.length > 1) args(1) else
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Bench's exact session recipe — a probe on different conf (e.g.
    // Spark's default broadcast threshold instead of Bench's 512m)
    // can attribute a plan the bench run never executes.
    val master = graft.util.BenchSession.master
    val spark = graft.util.BenchSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    final case class Row(id: Int, name: String, tasks: Int, taskSec: Double,
                         gcSec: Double, serSec: Double, deserSec: Double,
                         inMB: Double, shReadMB: Double, shWriteMB: Double)
    val rows = ArrayBuffer.empty[Row]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo; val m = si.taskMetrics
        rows += Row(si.stageId,
          si.name.split('\n').head.take(60),
          si.numTasks,
          m.executorRunTime / 1e3,
          m.jvmGCTime / 1e3,
          m.resultSerializationTime / 1e3,
          m.executorDeserializeTime / 1e3,
          m.inputMetrics.bytesRead / 1e6,
          m.shuffleReadMetrics.totalBytesRead / 1e6,
          m.shuffleWriteMetrics.bytesWritten / 1e6)
      }
    })

    def once(tag: String): Unit = {
      rows.clear()
      val t0 = System.nanoTime()
      SparkEntryRef.run(spark, qname, sfDir)
      val wall = (System.nanoTime() - t0) / 1e9
      // listener events drain asynchronously — settle before printing
      Thread.sleep(2000)
      val load = java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage
      println(f"== $tag $qname wall=$wall%.2f s load=$load%.1f master=$master")
      println(f"${"id"}%4s ${"tasks"}%5s ${"task-s"}%8s ${"gc-s"}%6s ${"deser-s"}%7s ${"in-MB"}%8s ${"shR-MB"}%8s ${"shW-MB"}%8s  name")
      rows.sortBy(-_.taskSec).take(18).foreach { r =>
        println(f"${r.id}%4d ${r.tasks}%5d ${r.taskSec}%8.1f ${r.gcSec}%6.1f ${r.deserSec}%7.1f ${r.inMB}%8.1f ${r.shReadMB}%8.1f ${r.shWriteMB}%8.1f  ${r.name}")
      }
      println(f"   total task-s: ${rows.map(_.taskSec).sum}%.1f, stages: ${rows.size}, shuffleWrite: ${rows.map(_.shWriteMB).sum}%.0f MB")
    }
    once("warm")
    once("measured")
    spark.stop()
  }

  /** Indirection so the probe compiles without importing graft.SparkEntry
    * at top level (keeps tools decoupled if queries move). */
  private object SparkEntryRef {
    def run(spark: SparkSession, name: String, sfDir: String): Unit = {
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
      if (sys.env.contains("SPARK_GRAFT_PLAN")) {
        val plan = df.queryExecution.executedPlan.toString
        plan.linesIterator.filter(l =>
          l.contains("Join") || l.contains("Broadcast") || l.contains("Exchange"))
          .foreach(l => println("[plan] " + l.trim.take(200)))
      }
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
  }
}
