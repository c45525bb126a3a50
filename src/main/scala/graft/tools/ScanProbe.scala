package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-probe separating a text query's cost layers: raw parquet
  * string decode (sum(length)), the native token-count walk, and the
  * classifier digest walk — the decomposition BENCH_LOCAL.md's floor
  * investigations cite. Usage: runMain graft.tools.ScanProbe <sfDir> */
object ScanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val probes: Seq[(String, () => Unit)] = Seq(
      "scan_len" -> (() =>
        docs.agg(sum(length(col("text")))).collect()),
      "tok_count" -> (() =>
        docs.agg(sum(graft.functions.TextFunctions.spaceTokenCount(col("text")))).collect()),
      "clf_score" -> (() =>
        docs.agg(sum(graft.functions.NativeExpressions.classifier_score_text(col("text")))).collect())
    )
    // one warm pass, then two measured
    probes.foreach(_._2())
    probes.foreach { case (name, run) =>
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        run()
        println(f"[probe] $name#$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
