package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev scratch: what sizeInBytes does the planner believe for the
  * pinned MinHash intermediates? (Chasing rogue static broadcasts of
  * pin-derived join sides observed at sf10 in local-cluster mode.) */
object StatsProbe {
  def main(args: Array[String]): Unit = {
    graft.util.LauncherCheck.assertModuleOpens()
    val sfDir = if (args.nonEmpty) args(0) else "/tmp/sf10"
    // Bench's exact session recipe (BenchSession) — believed stats are
    // only meaningful under the conf the bench actually plans with.
    val spark = graft.util.BenchSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def st(label: String, df: DataFrame): Unit = {
      val s = df.queryExecution.optimizedPlan.stats
      println(f"[stats] $label%-28s sizeInBytes=${s.sizeInBytes}%,d rowCount=${s.rowCount}")
    }

    val d = graft.Tables.load(spark, sfDir, "documents")
    st("documents scan", d)
    val bucket = graft.functions.TextFunctions.splitBucket(col("doc_id"))
    val existing = d.filter(bucket < 80)
    val incoming = d.filter(bucket >= 80)
    st("existing (80%)", existing)
    val index = graft.operators.Dedup.buildMinhashIndex(existing, "doc_id", "text",
      numHashes = 128, bands = 32, useMd5 = true, oph = false)
    st("index.bands", index.bands)
    st("index.sigs", index.sigs)
    val verdict = graft.operators.Dedup.minhashIncrementalAgainst(index, incoming,
      "doc_id", "text", numHashes = 128, bands = 32, threshold = 0.7,
      useMd5 = true, oph = false)
    st("verdict (full plan)", verdict)
    // r17 kernel-floor routes read these stats — print what they see.
    val shPin = graft.util.Checkpoints.pin(
      d.select(col("doc_id").as("doc"),
        graft.operators.Dedup.simhash(
          graft.operators.Dedup.tokens(col("text")), useMd5 = true).as("sh")))
    st("hamming (doc,sh) pin", shPin)
    spark.stop()
  }
}
