package graft.tools
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev measurement harness for the MinHash distinct-signature
  * pre-collapse: replicates the `documents` corpus R× with fresh ids
  * (identical texts → identical signatures — the boilerplate-dup shape
  * that dominates crawled corpora), then times the collapsed
  * [[graft.operators.Dedup.minhashPairs]] against the uncollapsed
  * pre-round-10 plan on the SAME pinned input and checks the pair sets
  * agree pointwise (count + order-insensitive xxhash fingerprint; the
  * per-value equality is spec'd in TrainingOpsSpec).
  *
  * args: sfDir [replication=10] [oph=true]
  */
object DupDenseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rep = args.lift(1).map(_.toInt).getOrElse(10)
    val oph = args.lift(2).forall(_.toBoolean)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4000000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Dedup

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val n = docs.count()
    // fresh replica ids are doc_id * rep + copy — guard the remap
    // against overflow/collision for corpora with huge ids
    val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
    require(maxId <= Long.MaxValue / rep - rep,
      s"doc_id $maxId * rep $rep would overflow the replica id remap")
    val corpus = docs.crossJoin(
        spark.range(rep).select(col("id").as("__copy")))
      .select((col("doc_id") * rep + col("__copy")).as("doc_id"), col("text"))
      .transform(graft.util.Checkpoints.pin)
    println(s"[probe] corpus: ${n * rep} docs ($n x $rep replicas), oph=$oph")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime; val r = f
      println(f"[probe] $label: ${(System.nanoTime - t0) / 1e9}%.1f s"); r
    }
    def fp(p: DataFrame): (Long, Long) = {
      val r = p.agg(count(lit(1)),
        bit_xor(xxhash64(col("doc_a"), col("doc_b"), col("est_jaccard")))).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }

    // The uncollapsed pre-round-10 plan, for the head-to-head —
    // single-sourced in ReferencePlans (TrainingOpsSpec proves it
    // bit-identical to the production plan; this probe times it).
    def uncollapsed(df: DataFrame, threshold: Double): DataFrame =
      ReferencePlans.uncollapsedMinhashPairs(df, "doc_id", "text",
        threshold = threshold, oph = oph,
        checkpoint = graft.util.Checkpoints.pin)

    val th = 0.7
    // warm both once at tiny scale for JIT parity
    Dedup.minhashPairs(docs.limit(500), "doc_id", "text", threshold = th, oph = oph)
      .write.format("noop").mode("overwrite").save()
    uncollapsed(docs.limit(500), th).write.format("noop").mode("overwrite").save()

    val newFp = time("collapsed minhashPairs") {
      val p = Dedup.minhashPairs(corpus, "doc_id", "text", threshold = th, oph = oph)
      fp(p)
    }
    val oldFp = time("uncollapsed plan") { fp(uncollapsed(corpus, th)) }
    println(s"[probe] pairs: collapsed=${newFp._1} uncollapsed=${oldFp._1} " +
      s"fingerprints ${if (newFp == oldFp) "MATCH" else s"DIFFER $newFp vs $oldFp"}")
    spark.stop()
  }
}
