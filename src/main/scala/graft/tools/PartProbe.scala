package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch: does a pinned (checkpointed) DataFrame carry its
  * pre-pin partitioning into consumers, or does the exchange repeat? */
object PartProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val df = (1 to 1000).map(i => (i.toLong, Array.fill(4)(i.toLong % 50))).toDF("id", "sig")
      .repartition(col("sig"))

    def noAqe[T](f: => T): T = {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try f finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
    for ((label, pinned) <- Seq(
        ("lazy-pin", graft.util.Checkpoints.pinLazy(df)),
        ("eager-pin", graft.util.Checkpoints.pin(df)),
        ("noaqe-lazy-pin", noAqe(graft.util.Checkpoints.pinLazy(df))),
        ("persist", df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)))) {
      val node = pinned.queryExecution.optimizedPlan
      println(s"== $label logical: ${node.getClass.getSimpleName}")
      node match {
        case r: org.apache.spark.sql.execution.LogicalRDD =>
          println(s"   outputPartitioning = ${r.outputPartitioning}")
        case _ => ()
      }
      val consumer = pinned.groupBy("sig").agg(count(lit(1)).as("n"))
      val plan = consumer.queryExecution.executedPlan.toString
      val nEx = "Exchange hashpartitioning".r.findAllIn(plan).size
      println(s"   groupBy-consumer exchanges: $nEx")
      // a join consumer keyed by sig, small other side
      val other = (1 to 50).map(i => (Array.fill(4)(i.toLong), i)).toDF("sig", "tag")
      val jplan = pinned.join(other, Seq("sig")).queryExecution.executedPlan.toString
      println(s"   join-consumer exchanges: ${"Exchange hashpartitioning".r.findAllIn(jplan).size}, broadcasts: ${"BroadcastExchange".r.findAllIn(jplan).size}")
      pinned.unpersist(false)
    }
    spark.stop()
  }
}
