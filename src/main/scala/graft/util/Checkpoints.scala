package graft.util

import org.apache.spark.sql.DataFrame

/** The one checkpoint seam for every operator that PINS a
  * nondeterministic intermediate — sampled range boundaries
  * (ScalableWindow, TextPipeline.bm25 sharding), time-derived
  * snowflake ids (GraftCatalog ingest), iterative lineage caps
  * (union-find, PageRank, BPE merges).
  *
  * Default is `localCheckpoint`: blocks live on executors, fastest,
  * but a lost executor forces a recompute that re-draws the
  * nondeterminism (re-sampled boundaries shear rank offsets;
  * re-stamped snowflake ids change identity). On a real cluster set
  * `graft.checkpoint.reliable=true` and every consumer switches to
  * reliable `df.checkpoint()` — recoverable from storage, same
  * pinned values after any executor loss. The location comes from
  * `graft.checkpoint.dir` (HDFS/object storage) when the
  * SparkContext has none set. One switch, all call sites.
  */
object Checkpoints {

  def pin(df: DataFrame): DataFrame = pin(df, eager = true)

  def pin(df: DataFrame, eager: Boolean): DataFrame = {
    val ss = df.sparkSession
    if (ss.conf.getOption("graft.checkpoint.reliable").exists(_.toBoolean)) {
      if (ss.sparkContext.getCheckpointDir.isEmpty)
        ss.conf.getOption("graft.checkpoint.dir")
          .foreach(ss.sparkContext.setCheckpointDir)
      df.checkpoint(eager)
    } else df.localCheckpoint(eager)
  }

  /** Lazy variant for lineage caps inside iterative loops. */
  def pinLazy(df: DataFrame): DataFrame = pin(df, eager = false)
}
