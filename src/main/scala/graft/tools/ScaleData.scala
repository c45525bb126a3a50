package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scales the driver-generated TPC-H-ish testdata to larger scale
  * factors for local benchmarking (VERDICT r1 asked for bench proof at
  * sf1+ where Spark's fixed per-query overhead is <10% of runtime).
  *
  * Replication is TPC-H-shaped: fact/dimension tables are replicated
  * `factor`× with key strides so join fan-outs stay identical per
  * copy (an order still has the same lineitems, a customer the same
  * orders); `region`/`nation` stay fixed like TPC-H. `documents` get a
  * per-copy marker token appended (copies are near-dups, not exact
  * dups — keeps the dedup workload honest), and `embeddings` get small
  * deterministic per-copy noise so cosine structure survives but no
  * vector is an exact duplicate.
  *
  * Usage: runMain graft.tools.ScaleData <srcDir> <dstDir> <factor>
  * Output: one flat `<table>.parquet` file per table (single-file
  * parquet is row-group-splittable for Spark AND directly readable by
  * the DuckDB comparison tool `tools/bench_duck.py`).
  */
object ScaleData {
  def main(args: Array[String]): Unit = {
    val Array(srcDir, dstDir, factorS) = args.take(3)
    val factor = factorS.toInt
    require(factor >= 1, "factor must be >= 1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // Tables.load normalizes events.ts (nanos-long -> micros timestamp),
    // so the scaled copy is written as standard TIMESTAMP(MICROS) that
    // both Spark and the DuckDB bench tool read directly.
    def src(t: String): DataFrame = graft.Tables.load(spark, srcDir, t)

    def stride(df: DataFrame, key: String): Long =
      df.agg(max(col(key).cast("long"))).as[Long].head() + 1L

    // Cross-join each row with copy ids 0..factor-1, then remap.
    // copy 0 is the identity so the scaled data contains the original.
    def replicate(df: DataFrame)(remap: (DataFrame, String) => DataFrame): DataFrame = {
      val copies = spark.range(factor).toDF("__copy")
      remap(df.crossJoin(broadcast(copies)), "__copy").drop("__copy")
    }

    def offsetKeys(keysAndStrides: (String, Long)*)(df: DataFrame, c: String): DataFrame =
      keysAndStrides.foldLeft(df) { case (d, (k, s)) =>
        d.withColumn(k, col(k) + col(c) * lit(s))
      }

    val custStride = stride(src("customer"), "c_custkey")
    val suppStride = stride(src("supplier"), "s_suppkey")
    val partStride = stride(src("part"), "p_partkey")
    val orderStride = stride(src("orders"), "o_orderkey")
    val docStride = stride(src("documents"), "doc_id")
    val vecStride = stride(src("embeddings"), "vec_id")
    val eventStride = stride(src("events"), "event_id")
    val userStride = stride(src("events"), "user_id")

    val out: Seq[(String, DataFrame)] = Seq(
      "region" -> src("region"),
      "nation" -> src("nation"),
      "customer" -> replicate(src("customer"))(offsetKeys("c_custkey" -> custStride)),
      "supplier" -> replicate(src("supplier"))(offsetKeys("s_suppkey" -> suppStride)),
      "part" -> replicate(src("part"))(offsetKeys("p_partkey" -> partStride)),
      "orders" -> replicate(src("orders"))(
        offsetKeys("o_orderkey" -> orderStride, "o_custkey" -> custStride)),
      "lineitem" -> replicate(src("lineitem"))(
        offsetKeys("l_orderkey" -> orderStride, "l_partkey" -> partStride,
          "l_suppkey" -> suppStride)),
      "events" -> replicate(src("events"))(
        offsetKeys("event_id" -> eventStride, "user_id" -> userStride)),
      "documents" -> replicate(src("documents")) { (df, c) =>
        val d = offsetKeys("doc_id" -> docStride)(df, c)
          .withColumn("text",
            when(col(c) === 0, col("text"))
              .otherwise(concat(col("text"), lit(" v"), col(c).cast("string"))))
        d.withColumn("n_chars", length(col("text")).cast("long"))
      },
      "embeddings" -> replicate(src("embeddings")) { (df, c) =>
        offsetKeys("vec_id" -> vecStride)(df, c)
          .withColumn("embedding",
            when(col(c) === 0, col("embedding")).otherwise(
              transform(col("embedding"), (x, i) =>
                (x + (pmod(hash(col("vec_id"), i), lit(1000)).cast("float")
                  - lit(500.0f)) / lit(100000.0f)).cast("float"))))
      }
    )

    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    new java.io.File(dstDir).mkdirs()
    out.foreach { case (name, df) =>
      val tmp = s"$dstDir/__tmp_$name"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = fs.globStatus(new org.apache.hadoop.fs.Path(s"$tmp/part-*.parquet"))
        .head.getPath
      fs.rename(part, new org.apache.hadoop.fs.Path(s"$dstDir/$name.parquet"))
      fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
      println(s"[scale] $name -> $dstDir/$name.parquet")
    }
    spark.stop()
  }
}
