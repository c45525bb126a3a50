package graft.streaming

import graft.sources.GraftCatalog
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured Streaming ingest (the upgrade path for the reference's
  * file-rotation micro-batcher, SURVEY §2B "Streaming"): the rotated
  * NDJSON directory becomes a file-source stream; each micro-batch
  * appends to the catalog table through the same casting path as the
  * batch loader. Watermarked windowed aggregations ride on top.
  *
  * At scale: file-source streams list the source dir per trigger —
  * feed a compact dir (or a queue-backed source) and size
  * `maxFilesPerTrigger` so one trigger's batch fits the cluster.
  */
object StreamingIngest {

  /** NDJSON directory → streaming DataFrame under an explicit lattice
    * schema (inference is not allowed on streams, by design). */
  def streamNdjsonDir(spark: SparkSession, dir: String, schema: StructType,
                      maxFilesPerTrigger: Int = 16): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(dir)

  /** Continuous ingest into a catalog table: every micro-batch goes
    * through GraftCatalog.appendWithPolicy (projection + casts
    * identical to the batch loader, AND the same per-table dedup
    * policy the HTTP batch path honors — a table configured for
    * tag/drop near-dup handling behaves identically whether rows
    * arrive by file rotation or by stream). */
  def ingestToCatalog(stream: DataFrame, catalog: GraftCatalog,
                      db: String, table: String,
                      checkpointDir: String,
                      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        catalog.appendWithPolicy(db, table, batch): Unit
      }
      .start()

  /** Tumbling-window counts with a watermark (late rows beyond the
    * watermark are dropped; state is bounded). */
  def tumblingCounts(events: DataFrame, tsCol: String, windowDur: String,
                     watermark: String, keyCols: String*): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur) +: keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .select((col("window.start").as("window_start") +:
        col("window.end").as("window_end") +: keyCols.map(col)) :+ col("n"): _*)

  /** Streaming exact dedup: drop re-deliveries of the same key within
    * the watermark horizon (bounded state). This is how at-least-once
    * ingest (the queue redelivers on failure) becomes effectively-once
    * in the streamed tables. */
  def dedupStream(events: DataFrame, tsCol: String, watermark: String,
                  keyCols: String*): DataFrame =
    events.withWatermark(tsCol, watermark)
      .dropDuplicates(keyCols :+ tsCol)

  /** Streaming incremental near-dup dedup: every micro-batch of
    * documents is deduped against an existing corpus's
    * [[graft.operators.Dedup.MinhashIndex]] via
    * [[graft.operators.Dedup.minhashIncrementalAgainst]] inside
    * foreachBatch — the batch operator IS the streaming operator, run
    * per trigger. The index is built (or reloaded from its stored
    * tables) ONCE, before the stream starts; per-trigger work is
    * batch-sized signatures + one equi-join against the index — never
    * corpus-sized. All dedup parameters flow through, so a stream can
    * probe an index built under any convention (e.g. the md5 family
    * the dedup_incremental oracle uses). Verdict rows
    * (idCol, is_dup, dup_of) go to `sink`.
    */
  def incrementalDedupStream(stream: DataFrame,
                             index: graft.operators.Dedup.MinhashIndex,
                             idCol: String, textCol: String,
                             checkpointDir: String,
                             sink: DataFrame => Unit,
                             trigger: Trigger = Trigger.AvailableNow(),
                             shingleK: Int = 5, numHashes: Int = 128,
                             bands: Int = 32, threshold: Double = 0.7,
                             seed: Long = 42L, useMd5: Boolean = false,
                             oph: Boolean = true): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink(graft.operators.Dedup.minhashIncrementalAgainst(
          index, batch, idCol, textCol,
          shingleK, numHashes, bands, threshold, seed, useMd5, oph))
      }
      .start()

  /** Convenience overload: build the index from a static corpus once,
    * then stream against it. The index DataFrames are persisted here —
    * without that, laziness would re-run the corpus-side signature scan
    * on every trigger even though the plan object is shared. */
  def incrementalDedupStream(stream: DataFrame, corpus: DataFrame,
                             idCol: String, textCol: String,
                             checkpointDir: String,
                             sink: DataFrame => Unit): StreamingQuery = {
    val idx = graft.operators.Dedup.buildMinhashIndex(corpus, idCol, textCol)
    val pinned = graft.operators.Dedup.MinhashIndex(
      idx.bands.persist(), idx.sigs.persist())
    incrementalDedupStream(stream, pinned, idCol, textCol, checkpointDir, sink)
  }

  /** Session windows (gap-based) — the sessionization the reference's
    * users run in SQL, as a native stateful streaming op. */
  def sessionCounts(events: DataFrame, tsCol: String, gap: String,
                    watermark: String, keyCols: String*): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap) +: keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .select((col("session_window.start").as("session_start") +:
        col("session_window.end").as("session_end") +: keyCols.map(col)) :+ col("n"): _*)
}
