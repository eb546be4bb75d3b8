package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.ops.Ingest

/** Structured-Streaming wrapper over the batch ingest transforms
  * (SURVEY §2.8): the reference's webhook processes one HTTP request per
  * invocation; here a landing directory of JSON bodies plays the request
  * stream and each micro-batch runs the same normalize → project → dual
  * write (people + audit) via foreachBatch — which also reproduces the
  * reference's "log even on failure" try/catch semantics, since the audit
  * write happens in the same foreachBatch whether or not the people write
  * throws.
  *
  * No watermarks or stateful operators — the reference has none
  * (at-most-once, no dedup, no late data); resist inventing them
  * (SURVEY §7.4.7). Rate limiting lives in the sink, not in state.
  */
object IngestStream {

  /** Start the ingest stream: one line-delimited JSON request body per
    * file line in `landingDir` → append people to `peoplePath` and one
    * audit row per micro-batch to `auditPath`.
    */
  def start(spark: SparkSession, landingDir: String, peoplePath: String,
            auditPath: String, checkpoint: String,
            sourceIp: String = "stream"): StreamingQuery = {
    val raw = spark.readStream
      .schema("value STRING")
      .option("wholetext", "false")
      .text(landingDir)

    raw.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchNum: Long) =>
        if (!batch.isEmpty) {
          val (people, audit) = Ingest.processRequest(batch, "value", sourceIp)
          var insertError: Option[String] = None
          try people.write.mode("append").parquet(peoplePath)
          catch { case e: Exception => insertError = Some(e.getMessage) }
          // a failed people-write flips every request of the micro-batch
          // to error (the reference's insert-error path, index.ts:98-113)
          val auditOut = insertError match {
            case None => audit
            case Some(msg) => audit
              .withColumn("status", lit("error"))
              .withColumn("error_message", lit(msg))
              .withColumn("records_inserted", lit(0))
          }
          auditOut.write.mode("append").parquet(auditPath)
        }
        ()
      }
      .start()
  }

  /** Batch-equivalent windowed aggregation over the events stream — the
    * shape a monitoring query takes on the ingest volume (per-minute ×
    * type counts); `events_minute_window` in the oracle set is exactly
    * this computed in batch.
    */
  def monitorCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 minute"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
}
