package graft.streaming

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
  *  - index growth: [[graft.sinks.ManifestTable.appendOnce]] — the
  *    manifest itself carries a per-stream batch-version watermark
  *    (the Delta `txn` action), committed atomically WITH the append,
  *    so a redelivered batch skips no matter where the previous
  *    attempt crashed. This replaced the r6 marker-file design, whose
  *    crash-between-append-and-marker window duplicated index entries:
  *    harmless to pair correctness (the probe's pair-key grouping
  *    collapses them) but not to RECALL — duplicates inflate
  *    per-bandkey occupancy toward `maxBucketSize`, and a bucket
  *    pushed over the cap silently degrades to hub-only pairing.
  *    Exactly-once append closes that recall hazard, not just the
  *    space leak.
  *  - history: each batch runs `compact` (bounds per-bucket read
  *    fan-out) and `vacuum` with a wall-clock retention floor (bounds
  *    manifest/orphan growth for an unbounded stream) — without the
  *    vacuum, compact's retired versions and their dereferenced data
  *    dirs accumulate forever.
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
  private[graft] val DefaultAppId = "indexed-dedup-stream"

  private[graft] def processBatch(indexPath: String, outPath: String,
                                  shingleN: Int, numHashes: Int, bands: Int,
                                  threshold: Double,
                                  appId: String = DefaultAppId)
                                 (batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    if (!batch.isEmpty) {
      // two passes over the batch (probe + append) — pin the tiny slice
      val docs = batch.localCheckpoint()
      IncrementalDedup.probe(spark, indexPath, docs, "doc_id", "text",
          shingleN, numHashes, bands, threshold)
        .write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
      val appended = graft.sinks.ManifestTable.appendOnce(spark, indexPath,
        IncrementalDedup.indexEntries(docs, "doc_id", "text",
          shingleN, numHashes, bands),
        "bandkey", appId, batchId)
      if (appended) {
        // bound read fan-out across many streamed batches: a no-op
        // (one manifest read) until some bucket's dir list grows past
        // the cap, then folds just those buckets
        graft.sinks.ManifestTable.compact(spark, indexPath, maxDirs = 32)
        // ...and bound HISTORY: retire manifests beyond the last few
        // versions unless younger than the retention floor (protects
        // concurrent batch readers of recent snapshots), reclaiming
        // compact's dereferenced directories
        graft.sinks.ManifestTable.vacuum(spark, indexPath,
          keepVersions = 4, retainMs = 15L * 60 * 1000)
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
            threshold: Double = 0.5, appId: String = DefaultAppId): StreamingQuery = {
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
        processBatch(indexPath, outPath, shingleN, numHashes, bands,
          threshold, appId) _)
      .start()
  }
}
