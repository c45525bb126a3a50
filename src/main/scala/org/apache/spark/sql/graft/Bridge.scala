package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 made the direct constructors
  * `private[sql]`; extensions conventionally expose them from a file
  * compiled into the org.apache.spark.sql namespace (same pattern
  * third-party Spark connectors use).
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Replace the origin statistics a checkpointed Dataset's LogicalRDD
    * inherited from the plan it pinned with the pin's MEASURED size —
    * or with nothing when the pin is not materialized yet.
    *
    * `Dataset.checkpoint`/`localCheckpoint` copy the ORIGIN plan's
    * estimated `Statistics` into the LogicalRDD
    * (`LogicalRDD.fromDataset`), and those estimates descend from the
    * COMPRESSED file size of the scan. For text/array-heavy data the
    * in-memory relation is one to two orders of magnitude bigger
    * (measured: a 12.1 MB snappy documents.parquet yields a pinned
    * signature table estimated at 3.5 MB that builds a 284 MiB
    * broadcast), so the static planner happily broadcasts pin-derived
    * join sides that each executor must then transfer, rebuild, and
    * GC — or OOM on at real scale.
    *
    * An EAGER pin has its blocks in the block manager (or, for a
    * reliable checkpoint, its files on the checkpoint FS), so the TRUE
    * serialized size is known — installing it lets the optimizer make
    * every size-based decision (broadcast, join build side) on real
    * bytes: genuinely small pins still broadcast, fat ones never do,
    * and `spark.sql.autoBroadcastJoinThreshold` means what it says.
    * A lazy pin's size is unknowable at planning time — its stats are
    * stripped, falling back to `spark.sql.defaultSizeInBytes`
    * (Long.MaxValue): never statically broadcast, while AQE still
    * converts to broadcast joins from actual runtime shuffle sizes.
    * Non-LogicalRDD plans pass through unchanged.
    */
  def measuredPinStats(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    df.queryExecution.logical match {
      case r: org.apache.spark.sql.execution.LogicalRDD =>
        val session = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        val sc = session.sparkContext
        val measured: Option[BigInt] = sc.getRDDStorageInfo
          .find(_.id == r.rdd.id)
          .map(i => BigInt(i.memSize) + BigInt(i.diskSize))
          .filter(_ > 0)
          .orElse(r.rdd.getCheckpointFile.flatMap { p =>
            scala.util.Try {
              val path = new org.apache.hadoop.fs.Path(p)
              val fs = path.getFileSystem(sc.hadoopConfiguration)
              BigInt(fs.getContentSummary(path).getLength)
            }.toOption.filter(_ > 0)
          })
        val stats = measured.map(b =>
          org.apache.spark.sql.catalyst.plans.logical.Statistics(sizeInBytes = b))
        val rebuilt = org.apache.spark.sql.execution.LogicalRDD(
          r.output, r.rdd, r.outputPartitioning, r.outputOrdering, r.isStreaming,
          r.stream)(session, stats, None)
        org.apache.spark.sql.classic.Dataset.ofRows(session, rebuilt)
      case _ => df
    }
}
