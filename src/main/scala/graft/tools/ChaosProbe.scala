package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Executor-loss resilience probe — the multi-executor arm of the
  * checkpoint contract in [[graft.util.Checkpoints]]: under
  * `local-cluster` with `graft.checkpoint.reliable=true`, a query
  * whose plan pins intermediates must SURVIVE the loss of an executor
  * JVM mid-run and produce the same result as an undisturbed run
  * (reliable checkpoints re-read pinned blocks from storage; local
  * checkpoints would be gone with the executor and fail the job).
  *
  * Usage (SPARK_HOME must point at a Spark distribution so the
  * cluster can fork executor JVMs):
  *
  *   SPARK_HOME=/opt/spark sbt "runMain graft.tools.ChaosProbe \
  *     /root/testdata/sf0.1 local-cluster[2,8,4096] 6000"
  *
  * Runs dedup_minhash (pinned signature table feeding five consumers)
  * twice: a baseline pass, then a chaos pass during which one
  * CoarseGrainedExecutorBackend process is SIGKILLed after `delayMs`.
  * Prints one JSON verdict line; exits nonzero on mismatch/failure.
  */
object ChaosProbe {

  private def executorPids(driverPid: Long): Seq[Long] = {
    val procs = new java.io.File("/proc").listFiles()
      .filter(f => f.isDirectory && f.getName.forall(_.isDigit))
    procs.flatMap { d =>
      try {
        val cmd = java.nio.file.Files.readString(
          java.nio.file.Paths.get(s"/proc/${d.getName}/cmdline")).replace('\u0000', ' ')
        val pid = d.getName.toLong
        if (cmd.contains("CoarseGrainedExecutorBackend") && pid != driverPid) Some(pid)
        else None
      } catch { case _: Exception => None }
    }.toSeq
  }

  private def fingerprint(df: DataFrame): (Long, Long) = {
    val cols = df.columns.sorted.map(c => col("`" + c + "`").cast("string"))
    val r = df.agg(count(lit(1)), bit_xor(xxhash64(cols.toIndexedSeq: _*))).head()
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val master = if (args.length > 1) args(1) else "local-cluster[2,8,4096]"
    val delayMs = if (args.length > 2) args(2).toLong else 6000L
    // r17: the r9 certification predates the packed block kernels —
    // "lsh" (NearDupBlock + the multi-executor pack pin) and "simhash"
    // (HammingPairsBlock) probe those plans' pins under executor loss.
    val qname = if (args.length > 3) args(3) else "minhash"
    val ckDir = java.nio.file.Files.createTempDirectory("graft-chaos-ck-").toString
    val spark = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.executor.extraClassPath",
        sys.env.getOrElse("SPARK_GRAFT_EXEC_CP",
          s"${sys.props("user.dir")}/target/scala-2.13/classes"))
      .config("graft.checkpoint.reliable", "true")
      .config("graft.checkpoint.dir", ckDir)
      // survive executor loss: allow task retries on the surviving
      // executor while the worker respawns a replacement
      .config("spark.task.maxFailures", "8")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def query(): DataFrame = qname match {
      case "lsh" =>
        val e = graft.Tables.load(spark, sfDir, "embeddings")
        graft.operators.Similarity.embeddingNearDupPairsLsh(
          e, "vec_id", "embedding", threshold = 0.35, dim = 64)
      case "simhash" =>
        val d = graft.Tables.load(spark, sfDir, "documents")
        graft.operators.Dedup.simhashPairs(d, "doc_id", "text",
          maxHamming = 3, useMd5 = true)
      case _ =>
        val d = graft.Tables.load(spark, sfDir, "documents")
        // md5 hash family: the deliberately-slow replicable kernel, so the
        // chaos run stays in flight long enough for mid-run kills
        graft.operators.Dedup.minhashDedup(d, "doc_id", "text",
          useMd5 = true, oph = false,
          checkpoint = df => graft.util.Checkpoints.pin(df)) // eager reliable pin
    }

    val baseline = fingerprint(query())
    println(s"[chaos] baseline rows=${baseline._1} hash=${baseline._2}")

    val driverPid = ProcessHandle.current().pid()
    println(s"[chaos] executors before kill: ${executorPids(driverPid).mkString(",")}")
    val killedPids = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val stopKiller = new java.util.concurrent.atomic.AtomicBoolean(false)
    // kill one executor every delayMs while the chaos pass runs — at
    // least one lands mid-query; the standalone Worker respawns a
    // replacement each time
    val killer = new Thread(() => {
      var rounds = 0
      while (!stopKiller.get() && rounds < 3) {
        Thread.sleep(delayMs)
        if (!stopKiller.get()) {
          executorPids(driverPid).headOption.foreach { pid =>
            System.err.println(s"[chaos] SIGKILL executor pid $pid")
            if (Runtime.getRuntime.exec(Array("kill", "-9", pid.toString)).waitFor() == 0)
              killedPids.add(pid)
          }
        }
        rounds += 1
      }
    }, "graft-chaos-killer")
    killer.setDaemon(true)
    killer.start()

    val chaos =
      try fingerprint(query())
      catch {
        case e: Exception =>
          println(s"""{"probe":"chaos","survived":false,"error":"${e.getClass.getName}"}""")
          spark.stop(); sys.exit(2)
      }
    stopKiller.set(true)
    val ok = chaos == baseline
    println(s"""{"probe":"chaos","survived":true,"match":$ok,""" +
      s""""rows":${chaos._1},"killedExecutors":${killedPids.size()},"master":"$master"}""")
    spark.stop()
    if (!ok || killedPids.isEmpty) sys.exit(1)
  }
}
