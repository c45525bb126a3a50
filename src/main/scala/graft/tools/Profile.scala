package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev scratch: time both physical strategies of an adaptive operator
  * in one warm JVM (used to pick crossover thresholds from data —
  * results recorded in BENCH_LOCAL.md). Not part of the library
  * surface.
  *
  * Usage: runMain graft.tools.Profile window <sfDir>
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val what = if (args.nonEmpty) args(0) else "window"
    val dir = if (args.length > 1) args(1) else
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[prof] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    what match {
      case "window" | "window1g" =>
        import org.apache.spark.sql.functions.lit
        val raw = graft.Tables.load(spark, dir, "lineitem")
        // window1g: worst grouping for the single-task plan — ONE
        // window key, so its sort cannot parallelize at all
        val li = if (what == "window1g")
          raw.withColumn("l_returnflag", lit("X")) else raw
        println(s"[prof] rows=${li.count()} dir=$dir mode=$what")
        // warm both paths once, then measure twice each
        for (round <- 0 to 2; mode <- Seq("single_task", "distributed")) {
          val limit = if (mode == "single_task") Long.MaxValue else 0L
          val label = if (round == 0) s"warm_$mode" else s"r$round $mode"
          t(label)(noop(
            graft.operators.ScalableWindow.analyticRankQuery(li, limit)))
        }
      case other => sys.error(s"unknown profile: $other")
    }
    spark.stop()
  }
}
