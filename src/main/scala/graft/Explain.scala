package graft

/** Dev tool: dump formatted physical plans for named queries so the
  * shuffle/broadcast/pushdown story is inspectable per operator.
  *
  * Runs the EXACT bench session recipe (graft.util.BenchSession —
  * same master, shuffle partitions, AQE, measured-stats broadcast
  * threshold, SPARK_GRAFT_* env knobs), because a plan dumped under a
  * different conf (e.g. Spark's default 10 MB broadcast threshold
  * instead of the bench's 512 MB) can show a join strategy the bench
  * never executes. SPARK_GRAFT_PLAN_DIR=dir writes one query.txt per
  * query instead of stdout (how the committed plans dumps are
  * produced).
  *
  * Usage: runMain graft.Explain <sfDir> [query ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    graft.util.LauncherCheck.assertModuleOpens()
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q_scan_filter", "q_join_multiway", "q_agg_pricing", "q_topk", "q_asof_join")
    val spark = graft.util.BenchSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val outDir = sys.env.get("SPARK_GRAFT_PLAN_DIR")
    outDir.foreach(d => new java.io.File(d).mkdirs())
    names.foreach { n =>
      val plan = SparkEntry.queries(n)(spark, sfDir)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      outDir match {
        case Some(d) =>
          java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$d/$n.txt"), plan)
          println(s"[explain] $n -> $d/$n.txt")
        case None =>
          println(s"\n========== $n ==========")
          println(plan)
      }
    }
    spark.stop()
  }
}
