package graft

import org.apache.spark.sql.SparkSession

/** Measures a large-vocab BPE training run (the VERDICT r4 scale
  * concern: merge rounds must not be one Spark job per merge). Args:
  * [sfDir] [numMerges] [batchSize]. Prints one JSON line. */
object BpeTrainBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val numMerges = if (args.length > 1) args(1).toInt else 1000
    val batchSize = if (args.length > 2) args(2).toInt else 32
    val spark = SparkSession.builder()
      .appName("graft-bpe-bench")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // The synthetic documents' template vocabulary exhausts its pair
    // population after ~90 merges — far short of a tokenizer-scale
    // run. Derive a merge-rich corpus from the same table: one
    // 32-char md5-hex word per doc gives |docs| distinct words over a
    // 16-symbol alphabet, which sustains thousands of merges with the
    // exact vocab-table round shape of real training.
    import org.apache.spark.sql.functions.{col, md5}
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(md5(col("text")).as("text"))
    val t0 = System.nanoTime()
    val (_, merges) = operators.TextPipeline.bpeTrainCore(
      docs, "text", numMerges, batchSize)
    val sec = (System.nanoTime() - t0) / 1e9
    println(s"""{"metric":"bpe_train_sec","value":$sec,"unit":"sec",""" +
      s""""merges_done":${merges.length},"requested":$numMerges,""" +
      s""""batch_size":$batchSize}""")
    spark.stop()
  }
}
