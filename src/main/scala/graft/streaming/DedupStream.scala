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
  * state at 16 bytes/doc-ever-seen per slot, and a production deployment
  * bounds it with `GroupStateTimeout.ProcessingTimeTimeout` (or event-
  * time TTL) once the dedup horizon is shorter than forever — the
  * timeout hook is already threaded here.
  */
object DedupStream {

  case class Doc(fp: Long, text: String)
  case class SeenState(nSeen: Long)
  case class UniqueDoc(fp: Long, text: String, n_dups_swallowed: Long)

  /** First-seen-wins per fingerprint. Emits a doc only when its key has
    * never been seen; later copies just bump the state counter.
    */
  private[streaming] def firstSeen(
      key: Long, docs: Iterator[Doc],
      state: GroupState[SeenState]): Iterator[UniqueDoc] = {
    val prev = state.getOption.map(_.nSeen).getOrElse(0L)
    val batch = docs.toSeq
    state.update(SeenState(prev + batch.size))
    if (prev == 0L && batch.nonEmpty)
      Iterator.single(UniqueDoc(key, batch.head.text, batch.size - 1L))
    else Iterator.empty
  }

  /** The dedup transform on any Dataset[Doc] (batch or streaming — the
    * spec exercises it through a real streaming query).
    */
  def dedupByFingerprint(docs: Dataset[Doc]): Dataset[UniqueDoc] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.fp)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(firstSeen)
  }

  /** Start the stream: one document per line under `landingDir` →
    * `outPath` receives exactly one parquet row per distinct content
    * fingerprint, ever (checkpointed state makes re-landed duplicates
    * no-ops across restarts).
    */
  def start(spark: SparkSession, landingDir: String, outPath: String,
            checkpoint: String): StreamingQuery = {
    import spark.implicits._
    val docs = spark.readStream
      .schema("value STRING")
      .text(landingDir)
      .select(TextAnalysis.fingerprint(col("value")).as("fp"),
        col("value").as("text"))
      .as[Doc]

    dedupByFingerprint(docs).writeStream
      .trigger(Trigger.AvailableNow())
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .format("parquet")
      .option("path", outPath)
      .start()
  }
}
