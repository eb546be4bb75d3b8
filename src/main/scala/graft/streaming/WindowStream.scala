package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/** Watermarked event-time windowed aggregation — the streaming form of
  * the batch `events_minute_window` query: per-minute per-type counts
  * over an event stream, with a watermark bounding both lateness and
  * state.
  *
  * Semantics under append mode: a window row is emitted exactly once,
  * when the watermark (max event time seen minus `lateness`) passes the
  * window end — so results are final, never retracted, and window state
  * is dropped as soon as it's emitted. That single property is what
  * makes the operator runnable forever at 100 TB/day: state is
  * O(windows inside the lateness horizon), independent of stream
  * length. Events later than the watermark are dropped (counted by the
  * driver's streaming metrics), the standard trade against unbounded
  * state.
  */
object WindowStream {

  /** Start the stream: line-delimited `epoch_seconds,event_type` records
    * under `landingDir` → finalized per-minute counts appended to
    * `outPath` parquet.
    */
  def start(spark: SparkSession, landingDir: String, outPath: String,
            checkpoint: String, lateness: String = "2 minutes"): StreamingQuery = {
    val raw = spark.readStream
      .schema("value STRING")
      .text(landingDir)
    val events = raw.select(
      timestamp_seconds(split(col("value"), ",").getItem(0).cast("long")).as("ts"),
      split(col("value"), ",").getItem(1).as("event_type"))

    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), "1 minute"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm").as("minute"),
        col("event_type"), col("n"))
      .writeStream
      .trigger(Trigger.AvailableNow())
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .format("parquet")
      .option("path", outPath)
      .start()
  }
}
