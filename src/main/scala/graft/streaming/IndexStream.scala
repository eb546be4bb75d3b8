package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}
import graft.ops.IncrementalDedup

/** Streaming front-end of the durable incremental-dedup index: the
  * micro-batch loop IS `ops.IncrementalDedup` — each arriving batch is
  * probed against everything accumulated so far (bootstrap corpus +
  * every earlier batch), its near-dup pairs land under
  * `outPath/batch=<id>`, and its band entries are appended to the
  * [[graft.sinks.ManifestTable]] index. Where `NearDupStream` keeps its
  * bucket membership in checkpointed executor STATE, this keeps it in
  * the shared durable TABLE: the same index serves concurrent batch
  * jobs, survives independently of the streaming checkpoint, and is
  * what the nightly batch pipeline reads and appends too.
  *
  * Exactly-once:
  *  - pair output: `overwrite` into the batch-id directory — a replayed
  *    batch rewrites the same files, never duplicates them;
  *  - index growth: a `_stream_commits/batch-<id>` marker inside the
  *    table gates the append — a replayed batch skips it. A crash
  *    BETWEEN append and marker leaves duplicate index entries on
  *    replay, which cost space, not correctness: probe's final
  *    pair-key grouping collapses them (and a replayed probe that
  *    already sees its own batch in the index emits the same
  *    normalized pairs its intra join does). `ManifestTable.vacuum`
  *    plus a re-`write` reclaim the space if it ever matters.
  *
  * The index must exist before the stream starts (bootstrap with
  * `IncrementalDedup.buildIndex`, possibly over just the first day's
  * corpus) — an empty parquet table has no recoverable schema to probe
  * against.
  */
object IndexedDedupStream {

  /** One micro-batch: probe, publish pairs, append-once. Factored out so
    * replay semantics are testable without steering a real checkpoint
    * into re-delivery.
    */
  private[graft] def processBatch(indexPath: String, outPath: String,
                                  shingleN: Int, numHashes: Int, bands: Int,
                                  threshold: Double)
                                 (batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    if (!batch.isEmpty) {
      // two passes over the batch (probe + append) — pin the tiny slice
      val docs = batch.localCheckpoint()
      IncrementalDedup.probe(spark, indexPath, docs, "doc_id", "text",
          shingleN, numHashes, bands, threshold)
        .write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
      val commits = new Path(indexPath, "_stream_commits")
      val marker = new Path(commits, s"batch-$batchId")
      val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(marker)) {
        IncrementalDedup.appendBatch(spark, indexPath, docs, "doc_id", "text",
          shingleN, numHashes, bands)
        // bound read fan-out across many streamed batches: a no-op
        // (one manifest read) until some bucket's dir list grows past
        // the cap, then folds just those buckets
        graft.sinks.ManifestTable.compact(spark, indexPath, maxDirs = 32)
        fs.mkdirs(commits)
        fs.create(marker, false).close()
      }
    }
  }

  /** Start the stream: `doc_id<TAB>text` lines under `landingDir` →
    * pairs under `outPath/batch=<id>`, index accumulating at
    * `indexPath`.
    */
  def start(spark: SparkSession, landingDir: String, indexPath: String,
            outPath: String, checkpoint: String,
            shingleN: Int = 2, numHashes: Int = 64, bands: Int = 16,
            threshold: Double = 0.5): StreamingQuery = {
    val docs = spark.readStream
      .schema("value STRING")
      .text(landingDir)
      .select(
        split(col("value"), "\t").getItem(0).cast("long").as("doc_id"),
        split(col("value"), "\t").getItem(1).as("text"))
    docs.writeStream
      .trigger(Trigger.AvailableNow())
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .foreachBatch(
        processBatch(indexPath, outPath, shingleN, numHashes, bands, threshold) _)
      .start()
  }
}
