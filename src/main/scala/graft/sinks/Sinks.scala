package graft.sinks

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Writers and side-effecting sinks (SURVEY §2.1 S5-S9, §2.6 D3/D5).
  *
  * Everything here is OUTSIDE the oracle set by design: writes and HTTP
  * calls are side effects. The HTTP fan-out is a trait so tests inject a
  * mock (mirroring the reference's own `skipWebhooks` test affordance,
  * send/route.ts:13).
  */
object Sinks {

  /** S5 — append insert. */
  def append(df: DataFrame, path: String): Unit =
    df.write.mode("append").parquet(path)

  /** S6 — insert-returning: append and hand back the appended batch WITH
    * its generated row ids (the reference's `.insert(x).select()` returns
    * the DB row including the minted id, webhooks/route.ts:34-38). Rows
    * lacking an `id` column get a fresh UUID; the batch is pinned (eager
    * local checkpoint) BEFORE the write so the returned rows carry exactly
    * the ids that hit disk — `uuid()` is nondeterministic, and a lazy
    * plan re-evaluated later would re-mint different ids.
    */
  def appendReturning(df: DataFrame, path: String): DataFrame = {
    val withId =
      if (df.columns.contains("id")) df
      else df.select(expr("uuid()").as("id") +: df.columns.map(col): _*)
    val pinned = withId.localCheckpoint(eager = true)
    pinned.write.mode("append").parquet(path)
    pinned
  }

  /** S7 — keyed update as a snapshot transform: read, rewrite matching
    * rows, overwrite. Correct at fixture scale; the SCALE path is
    * `BucketedTable.update` — hash-bucketed copy-on-write that rewrites
    * only the touched keys' buckets (Delta/Iceberg `UPDATE` adds the
    * atomic commit on the same layout). Writes to `outPath` (parquet
    * can't atomically overwrite its own input).
    */
  def keyedUpdate(spark: SparkSession, path: String, outPath: String,
                  keyCol: String, keyValue: Any,
                  updates: Map[String, Column]): Unit = {
    val df = spark.read.parquet(path)
    val updated = updates.foldLeft(df) { case (d, (c, v)) =>
      d.withColumn(c, when(col(keyCol) === keyValue, v).otherwise(col(c)))
    }
    updated.write.mode("overwrite").parquet(outPath)
  }

  /** S8 — keyed delete as a snapshot transform (`BucketedTable.delete`
    * at scale — touched buckets only).
    */
  def keyedDelete(spark: SparkSession, path: String, outPath: String,
                  keyCol: String, keyValue: Any): Unit =
    spark.read.parquet(path).filter(col(keyCol) =!= keyValue)
      .write.mode("overwrite").parquet(outPath)

  /** Small-file compaction: rewrite a parquet dataset into
    * ceil(size / targetBytes) files. The small-files problem is the
    * steady-state failure mode of every append-heavy warehouse path
    * (S5/D5 above append one file per micro-batch/task); compaction is
    * the maintenance op that keeps scan parallelism aligned with data
    * size instead of file count. Size comes from the optimizer's scan
    * statistics (file footer sum — no data read to plan the rewrite).
    * Returns the output file count.
    */
  def compact(spark: SparkSession, path: String, outPath: String,
              targetBytes: Long = 128L * 1024 * 1024): Int = {
    val df = spark.read.parquet(path)
    val sizeBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val nFiles = ((sizeBytes + targetBytes - 1) / targetBytes).toInt.max(1)
    df.repartition(nFiles).write.mode("overwrite").parquet(outPath)
    nFiles
  }

  /** Date-partitioned layout: the 100 TB fact-table write path. Each
    * day lands in its own directory, so time-ranged queries prune whole
    * partitions at planning time (PartitionFilters — zero I/O for
    * out-of-range days) instead of relying on row-group statistics.
    */
  def writeDatePartitioned(df: DataFrame, tsCol: String, path: String): Unit =
    df.withColumn("event_date", to_date(col(tsCol)))
      .write.mode("append").partitionBy("event_date").parquet(path)

  /** Batch upsert (MERGE): rows of `updates` replace same-key rows of
    * `existing`, new keys append — the copy-on-write shape of a Delta
    * `MERGE WHEN MATCHED UPDATE WHEN NOT MATCHED INSERT`. One anti-join
    * + union; both sides keep their partitioning on the key.
    */
  def merge(existing: DataFrame, updates: DataFrame, keyCol: String): DataFrame =
    existing.join(updates.select(col(keyCol)), Seq(keyCol), "left_anti")
      .unionByName(updates)

  /** D5 — send-ledger append: one row per assigned company, status always
    * 'sent' regardless of HTTP outcome — a faithful reproduction of the
    * reference's quirk (send/route.ts:140-158 never records failures).
    * Row ids and sent_at are minted HERE (X2 `uuid()` / X3
    * `current_timestamp()`): nondeterminism lives only in sink paths,
    * never in oracle-registered queries (SURVEY §7.4.1).
    */
  def ledgerRows(assigned: DataFrame, employeeRange: String,
                 batchId: String): DataFrame =
    assigned.select(
      expr("uuid()").as("id"),
      col("c_custkey").cast("string").as("company_id"),
      col("webhook_key").cast("string").as("webhook_id"),
      lit(employeeRange).as("employee_range"),
      lit(batchId).as("batch_id"),
      current_timestamp().as("sent_at"),
      lit("sent").as("status"))
}

/** The HTTP POST seam (S9/D3). Implementations must be Serializable —
  * they ship to executors.
  */
trait HttpPoster extends Serializable {
  /** @return true when the POST succeeded */
  def post(url: String, body: String): Boolean
}

/** Test double mirroring the reference's `skipWebhooks` flag: records
  * every would-be POST with its timestamp. Tasks deserialize closure
  * COPIES of the poster, so the buffer lives in a JVM-static registry
  * keyed by instance id — all copies in a local-mode JVM share it
  * (single-JVM scope only, exactly the scope of the tests).
  */
class MockPoster(failUrls: Set[String] = Set.empty) extends HttpPoster {
  val id: String = java.util.UUID.randomUUID().toString
  MockPoster.register(id)
  def calls: java.util.concurrent.ConcurrentLinkedQueue[(String, String, Long)] =
    MockPoster.buffers.get(id)
  override def post(url: String, body: String): Boolean = {
    MockPoster.register(id).add((url, body, System.nanoTime()))
    !failUrls.contains(url)
  }
}

object MockPoster {
  import java.util.concurrent.{ConcurrentHashMap, ConcurrentLinkedQueue}
  private[sinks] val buffers =
    new ConcurrentHashMap[String, ConcurrentLinkedQueue[(String, String, Long)]]()
  private def register(id: String): ConcurrentLinkedQueue[(String, String, Long)] =
    buffers.computeIfAbsent(id, _ => new ConcurrentLinkedQueue[(String, String, Long)]())
}

/** D3 — rate-limited HTTP fan-out: within each partition, POST rows in
  * sub-batches of `rateLimit`, sleeping `intervalMs` between sub-batches —
  * the reference's 10-requests-then-sleep-1s loop (send/route.ts:94-134),
  * generalized to a partition-parallel sink. Partition the input by
  * webhook so each webhook's ceiling is enforced independently (the
  * reference processes webhooks sequentially; partition-parallelism keeps
  * per-webhook ordering while webhooks proceed concurrently).
  *
  * Returns (sent, failed) per-row outcomes collected via the driver —
  * callers at scale should instead write outcomes to a ledger path from
  * within the partition.
  */
object RateLimitedFanout {

  def run(payloads: Dataset[(String, String)], poster: HttpPoster,
          rateLimit: Int = 10, intervalMs: Long = 1000): (Long, Long) = {
    val spark = payloads.sparkSession
    val sent = spark.sparkContext.longAccumulator("sent")
    val failed = spark.sparkContext.longAccumulator("failed")
    payloads.foreachPartition { it: Iterator[(String, String)] =>
      it.grouped(rateLimit).foreach { batch =>
        val t0 = System.nanoTime()
        batch.foreach { case (url, body) =>
          val ok = try poster.post(url, body) catch { case _: Exception => false }
          if (ok) sent.add(1) else failed.add(1)
        }
        // token-bucket: wait out the remainder of the interval, but only
        // if more rows follow (the reference sleeps between batches too;
        // skipping the trailing sleep just finishes earlier)
        if (it.hasNext) {
          val elapsedMs = (System.nanoTime() - t0) / 1000000
          if (elapsedMs < intervalMs) Thread.sleep(intervalMs - elapsedMs)
        }
      }
    }
    (sent.value, failed.value)
  }
}
