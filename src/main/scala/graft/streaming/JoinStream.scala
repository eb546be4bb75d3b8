package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/** Stream-stream interval join — attribution: each purchase joins the
  * clicks of the same user from the trailing 10 minutes, both sides
  * unbounded streams.
  *
  * Why the shape matters at scale: both inputs carry watermarks and the
  * join condition bounds event-time distance, so Spark can compute how
  * long a buffered row can still find a partner and EVICT it after
  * watermark + interval — state is O(rows inside the horizon), not
  * O(stream). An unconstrained stream-stream join (no watermark or no
  * time bound) buffers forever; this operator is the pattern that
  * doesn't. The join itself shuffles both sides on the user key, the
  * same equi-join scaling as its batch counterpart.
  */
object JoinStream {

  /** `clicksDir` lines: `epoch_seconds,user`; `purchasesDir` lines:
    * `epoch_seconds,user,amount`. Emits one row per (click, purchase)
    * pair of the same user with the click in the 10 minutes up to and
    * including the purchase.
    */
  def start(spark: SparkSession, clicksDir: String, purchasesDir: String,
            outPath: String, checkpoint: String): StreamingQuery = {
    val clicks = spark.readStream.schema("value STRING").text(clicksDir)
      .select(
        timestamp_seconds(split(col("value"), ",").getItem(0).cast("long")).as("click_ts"),
        split(col("value"), ",").getItem(1).as("user"))
      .withWatermark("click_ts", "10 minutes")
    val purchases = spark.readStream.schema("value STRING").text(purchasesDir)
      .select(
        timestamp_seconds(split(col("value"), ",").getItem(0).cast("long")).as("purchase_ts"),
        split(col("value"), ",").getItem(1).as("p_user"),
        split(col("value"), ",").getItem(2).cast("double").as("amount"))
      .withWatermark("purchase_ts", "10 minutes")

    clicks.join(purchases,
        col("user") === col("p_user") &&
          col("click_ts") >= col("purchase_ts") - expr("INTERVAL 10 MINUTES") &&
          col("click_ts") <= col("purchase_ts"),
        "inner")
      .select(col("user"),
        date_format(col("click_ts"), "yyyy-MM-dd HH:mm:ss").as("click_at"),
        date_format(col("purchase_ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_at"),
        col("amount"))
      .writeStream
      .trigger(Trigger.AvailableNow())
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .format("parquet")
      .option("path", outPath)
      .start()
  }
}
