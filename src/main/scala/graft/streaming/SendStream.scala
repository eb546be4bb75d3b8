package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.ops.Distribution
import graft.sinks.{HttpPoster, RateLimitedFanout, Sinks}

/** Streaming form of the send pipeline (SURVEY §3.2 as a stream): a
  * landing directory of company batches plays the send-request stream;
  * each micro-batch runs the SAME batch operators — rank → bucket-assign
  * → metadata-wrap → rate-limited fan-out → ledger append.
  *
  * Throughput shaping is two-level, mirroring the reference's design
  * constants: `maxFilesPerTrigger` bounds rows per micro-batch
  * (capacity planning, D9) and the fan-out sink enforces the
  * 10-posts-per-second-per-webhook ceiling (D3). No streaming state —
  * rate limiting lives in the sink (SURVEY §7.4.7).
  */
object SendStream {

  /** @param webhooks static webhook dim: (webhook_key LONG, url STRING,
    *                 webhook_name STRING)
    */
  def start(spark: SparkSession, landingDir: String, ledgerPath: String,
            webhooks: DataFrame, poster: HttpPoster, capacity: Long,
            employeeRange: String, rateLimit: Int = 10,
            intervalMs: Long = 1000,
            maxFilesPerTrigger: Int = 1): StreamingQuery = {
    import spark.implicits._
    val widx = Distribution.indexWebhooks(webhooks, Seq(col("webhook_key")))

    spark.readStream
      .schema("c_custkey LONG, c_name STRING")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(landingDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$ledgerPath-ckpt")
      .foreachBatch { (batch: DataFrame, batchNum: Long) =>
        if (!batch.isEmpty) {
          // scalable rank for consistency with the batch gate path (micro-
          // batches are bounded, but no single-partition window anywhere)
          val ranked = Distribution
            .rankGlobalScalable(batch, Seq(col("c_name"), col("c_custkey")))
            .withColumn("capacity", lit(capacity))
          val assigned = Distribution.assign(ranked, widx)
          val batchId = s"stream-batch-$batchNum"
          val payloads = assigned.select(
            col("url"),
            to_json(struct(col("c_custkey"), col("c_name"),
              struct(lit(batchId).as("batch_id"),
                date_format(current_timestamp(),
                  "yyyy-MM-dd'T'HH:mm:ss.SSSXXX").as("batch_timestamp"),
                lit(employeeRange).as("employee_range"),
                col("webhook_name"),
                lit("hq-data-warehouse").as("source")).as("_batch_metadata"))))
            .as[(String, String)]
          RateLimitedFanout.run(payloads, poster, rateLimit, intervalMs)
          Sinks.append(Sinks.ledgerRows(assigned, employeeRange, batchId), ledgerPath)
        }
        ()
      }
      .start()
  }
}
