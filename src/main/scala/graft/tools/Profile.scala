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
      case "qualify" =>
        // break q_qualify's residual into scan / heap-agg / explode
        import org.apache.spark.sql.functions._
        spark.conf.set("spark.sql.files.maxPartitionBytes", "16m")
        spark.conf.set(
          "spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4000000")
        val orders = graft.Tables.load(spark, dir, "orders")
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
        println(s"[prof] rows=${orders.count()} dir=$dir")
        for (round <- 0 to 2) {
          val pre = if (round == 0) "warm_" else s"r$round "
          t(pre + "scan")(noop(orders))
          t(pre + "agg_only")(noop(
            orders.groupBy(col("o_custkey"))
              .agg(graft.functions.TopK.topk_desc(
                col("o_totalprice"), col("o_orderkey"), 3).as("__tk"))))
          t(pre + "agg_pre_repart")(noop(
            orders.repartition(col("o_custkey"))
              .groupBy(col("o_custkey"))
              .agg(graft.functions.TopK.topk_desc(
                col("o_totalprice"), col("o_orderkey"), 3).as("__tk"))))
          t(pre + "full")(noop(graft.operators.ScalableWindow.topKPerGroup(
            orders, Seq("o_custkey"), "o_totalprice", "o_orderkey", 3, "rn")))
          t(pre + "window_form")(noop {
            import org.apache.spark.sql.expressions.Window
            val w = Window.partitionBy("o_custkey")
              .orderBy(col("o_totalprice").desc, col("o_orderkey"))
            orders.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
          })
        }
      case "tfidf" =>
        import org.apache.spark.sql.functions._
        spark.conf.set("spark.sql.files.maxPartitionBytes", "16m")
        val docs = graft.Tables.load(spark, dir, "documents")
        println(s"[prof] docs=${docs.count()}")
        for (round <- 0 to 2) {
          val pre = if (round == 0) "warm_" else s"r$round "
          t(pre + "scan_text")(noop(docs.select("doc_id", "text")))
          t(pre + "kernel_explode")(noop(docs.select(col("doc_id"),
            explode(graft.functions.NativeExpressions.word_counts(col("text")))
              .as("__wc"))))
          t(pre + "full")(noop(graft.operators.TextPipeline.tfidfTopTerms(
            docs, "doc_id", "text", 5)))
        }
        val q = graft.operators.TextPipeline.tfidfTopTerms(docs, "doc_id", "text", 5)
        noop(q)
        println(q.queryExecution.executedPlan.toString.linesIterator
          .map(l => s"[prof] $l").mkString("\n"))
      case other => sys.error(s"unknown profile: $other")
    }
    spark.stop()
  }
}
