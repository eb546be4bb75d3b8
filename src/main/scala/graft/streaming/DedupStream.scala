package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import graft.ops.TextAnalysis

/** Streaming exact dedup — the online half of the dedup suite (the batch
  * half is `ops.Dedup`): documents arrive as a stream, each is keyed by
  * its content fingerprint, and only the FIRST document per fingerprint
  * is emitted, across micro-batches AND restarts (the keyed state lives
  * in the checkpoint).
  *
  * Custom state via `flatMapGroupsWithState` rather than
  * `dropDuplicates`: the state also counts how many copies were
  * swallowed (a dedup pipeline wants the dup-rate observable), which a
  * plain distinct can't report without a second aggregation.
  *
  * Scale notes: state is partitioned by fingerprint (hash shuffle), so
  * it scales out with executors; at 100 TB the fingerprint key keeps
  * state at 16 bytes/doc-ever-seen per slot. When the dedup horizon is
  * shorter than forever, pass `ttlMs`: expired keys are evicted through
  * `GroupStateTimeout.ProcessingTimeTimeout`, and — because the timeout
  * callback only fires for keys with NO data in a batch — the function
  * also lazily expires a state older than the TTL when new data for the
  * key arrives first, so the horizon is exact either way. Default
  * (`ttlMs = None`) keeps the original unbounded first-seen-ever
  * semantics.
  */
object DedupStream {

  case class Doc(fp: Long, text: String)
  case class SeenState(nSeen: Long, lastSeenMs: Long = 0L)
  case class UniqueDoc(fp: Long, text: String, n_dups_swallowed: Long)

  /** First-seen-wins per fingerprint (within the TTL horizon, if one is
    * set). Emits a doc only when its key has no live state; later copies
    * just bump the state counter.
    */
  private[graft] def firstSeen(ttlMs: Option[Long])(
      key: Long, docs: Iterator[Doc],
      state: GroupState[SeenState]): Iterator[UniqueDoc] = {
    if (state.hasTimedOut) { // no data for this key since the TTL elapsed
      state.remove()
      Iterator.empty
    } else {
      val now = ttlMs.map(_ => state.getCurrentProcessingTimeMs()).getOrElse(0L)
      // lazy horizon check: data for the key can arrive before its
      // timeout callback fires — a state older than the TTL is expired
      // regardless, so the doc is "first seen" again
      val expired = ttlMs.exists(t => state.getOption.exists(s => now - s.lastSeenMs > t))
      val prev = if (expired) 0L else state.getOption.map(_.nSeen).getOrElse(0L)
      val batch = docs.toSeq
      state.update(SeenState(prev + batch.size, now))
      ttlMs.foreach(t => state.setTimeoutDuration(t))
      if (prev == 0L && batch.nonEmpty)
        Iterator.single(UniqueDoc(key, batch.head.text, batch.size - 1L))
      else Iterator.empty
    }
  }

  /** The dedup transform on any Dataset[Doc] (batch or streaming — the
    * spec exercises it through a real streaming query).
    */
  def dedupByFingerprint(docs: Dataset[Doc],
                         ttlMs: Option[Long] = None): Dataset[UniqueDoc] = {
    import docs.sparkSession.implicits._
    val timeout =
      if (ttlMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    docs.groupByKey(_.fp)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(firstSeen(ttlMs))
  }

  /** Start the stream: one document per line under `landingDir` →
    * `outPath` receives exactly one parquet row per distinct content
    * fingerprint, ever (checkpointed state makes re-landed duplicates
    * no-ops across restarts).
    */
  def start(spark: SparkSession, landingDir: String, outPath: String,
            checkpoint: String, ttlMs: Option[Long] = None): StreamingQuery = {
    import spark.implicits._
    val docs = spark.readStream
      .schema("value STRING")
      .text(landingDir)
      .select(TextAnalysis.fingerprint(col("value")).as("fp"),
        col("value").as("text"))
      .as[Doc]

    dedupByFingerprint(docs, ttlMs).writeStream
      .trigger(Trigger.AvailableNow())
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .format("parquet")
      .option("path", outPath)
      .start()
  }
}
