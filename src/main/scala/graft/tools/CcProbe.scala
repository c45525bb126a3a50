package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev measurement harness for the connected-components arm choice:
  * builds the threshold-0 rare-shingle pair graph of `documents`
  * (args(0) = sf dir), pins the canonical edge list once, then times
  * the driver union-find arm vs the alternating-star loop on the SAME
  * cached input (the only controlled way to compare them — a cold
  * pairs recompute inside either arm swamps the signal; see
  * BENCH_LOCAL "Round 7, connected components"). */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4000000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = graft.Tables.load(spark,
      if (args.nonEmpty) args(0) else "/root/testdata/sf0.1", "documents")
    val pairs = graft.operators.Dedup.ngramJaccardPairs(d, "doc_id", "text",
      shingleK = 5, threshold = 0.0, maxShingleFreq = 100)
    // pin the edge list once so both arms read the same cached input
    val edges = pairs.select(col("doc_a").cast("long").as("u"),
        col("doc_b").cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .distinct().localCheckpoint()
    val n = edges.count()
    println(s"[probe] edges=$n pinned")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime; val r = f
      println(f"[probe] $label: ${(System.nanoTime - t0)/1e9}%.1f s"); r
    }
    // local arm: collect + union-find (limit high via conf default)
    time("local union-find arm") {
      graft.operators.Dedup.connectedComponents(edges, "u", "v").count()
    }
    // distributed arm: force via conf
    spark.conf.set("graft.cc.localEdgeLimit", "0")
    time("distributed star loop") {
      graft.operators.Dedup.connectedComponents(edges, "u", "v").count()
    }
  }
}
