package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Test-corpus table loader (TESTDATA.md). Tables are single parquet
  * files under a scale-factor dir; at cluster scale these would be
  * partitioned directories — the read path is identical.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts is TIMESTAMP(NANOS) parquet, which Spark 4 rejects by
    // default; read nanos as long and truncate to micros (exactly what
    // DuckDB does internally, so oracle comparisons line up).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // Only convert when ts actually came in as nanos-long — scaled
    // bench copies (graft.tools.ScaleData) are written with proper
    // TIMESTAMP(MICROS) and need no conversion.
    val fixed =
      if (name == "events" &&
          df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        // integer `div`, NOT `/`: double division loses precision on
        // epoch-nanos (> 2^53) and shifts timestamps by up to ~128 ns
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else df
    // graft.scan.spread=true: guard against row-group-bound scan
    // parallelism (the local test corpus is written as ONE row group
    // per table — sf1 lineitem is 6M rows in a single group, so every
    // scan-fused stage runs in ONE task regardless of
    // maxPartitionBytes; see graft.util.ScanParallelism). Off by
    // default at load level: cheap scan-bound queries would pay an
    // exchange for nothing — CPU-dense operators guard their own
    // inputs instead.
    val spread = spark.conf.getOption("graft.scan.spread")
      .exists(_.toBoolean)
    val minBytes = spark.conf.getOption("graft.scan.spreadMinBytes")
      .map(_.toLong).getOrElse(8L << 20)
    if (spread &&
        new java.io.File(s"$dir/$name.parquet").length() >= minBytes)
      graft.util.ScanParallelism.spreadIfNarrow(fixed)
    else fixed
  }

  /** Register every table as a temp view (idempotent). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
