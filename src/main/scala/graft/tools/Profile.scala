package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch: per-phase wall timing of a query's constituent plans
  * in one warm JVM, to separate scan/shuffle cost from driver jobs.
  * Not part of the library surface. */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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

    val d = graft.Tables.load(spark, dir, "documents")
    t("warm_docs")(d.count())

    for (round <- 1 to 2) {
      t(s"r$round pairs_only")(noop(
        graft.operators.Dedup.ngramJaccardPairs(d, "doc_id", "text", 5, 0.0, 100)))
      t(s"r$round cc_checkpoint+count+collect") {
        val pairs = graft.operators.Dedup.ngramJaccardPairs(d, "doc_id", "text", 5, 0.0, 100)
        val comp = graft.operators.Dedup.connectedComponents(pairs, "doc_a", "doc_b")
        comp.count()
      }
      t(s"r$round full_components") {
        val pairs = graft.operators.Dedup.ngramJaccardPairs(d, "doc_id", "text", 5, 0.0, 100)
        val comp = graft.operators.Dedup.connectedComponents(pairs, "doc_a", "doc_b")
          .withColumnRenamed("node", "doc_id")
        noop(d.select(col("doc_id")).join(comp, Seq("doc_id"), "left_outer")
          .select(col("doc_id"), coalesce(col("component"), col("doc_id")).as("component")))
      }
    }
    spark.stop()
  }
}
