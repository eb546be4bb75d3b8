package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sinks.ManifestTable

/** Change-data-feed over a manifest table — the Delta `readChangeFeed`
  * story on this log: every committed version's keyed changes (insert /
  * update / delete with before/after row JSON) land as rows of a FEED
  * table that downstream consumers read like any other table, with
  * exactly-once folding and restart safety.
  *
  * Mechanics: the feed table stores one row per (version, key, change)
  * under a `change_id` key, plus a txn watermark recording the last
  * source version folded. [[fold]] walks the watermark forward ONE
  * VERSION AT A TIME through [[ManifestTable.diff]] — per-version
  * granularity, so two updates to one key in consecutive commits are
  * two feed rows, not a collapsed net effect — and lands each version's
  * changes atomically-with the watermark ([[ManifestTable.appendOnce]]:
  * a crash between versions replays into a no-op). [[start]] drives
  * fold from the source's manifest STREAM exactly the way
  * [[graft.sinks.MaterializedAgg.startContinuous]] drives refresh:
  * offsets are source versions, so triggers fire when commits exist,
  * and the micro-batch rows are deliberately unused.
  *
  * Scale shape: each version's diff reads only the buckets whose
  * pointers changed in that commit (the manifest diff bounds IO), so
  * feed maintenance costs O(actual changes), never O(table). Bounds to
  * respect: [[ManifestTable.vacuum]] retention must cover the feed's
  * lag (a retired version cannot be diffed), and a re-bucketing breaks
  * version-to-version diff — recreate the feed across one.
  *
  * The source table must be key-unique (the write/upsert/delete
  * discipline) — the same precondition `diff` enforces.
  */
object ChangeFeed {

  private val AppId = "graft-cdc"
  private val DefFile = "_feed.json"

  /** Define the feed and pin its starting watermark: changes land for
    * versions AFTER `fromVersion` (default: the source head — "from
    * now on", like `readChangeFeed` with `startingVersion=latest`).
    */
  def create(spark: SparkSession, feedPath: String, sourcePath: String,
             fromVersion: Option[Int] = None): Unit = {
    require(!sourcePath.contains('"'), s"source path not feed-safe: $sourcePath")
    val head = ManifestTable.headVersion(spark, sourcePath).getOrElse(
      throw new IllegalArgumentException(s"no committed source at $sourcePath"))
    val from = fromVersion.getOrElse(head)
    require(from >= 0 && from <= head,
      s"fromVersion $from outside the source's committed range [0, $head]")
    val fs = new Path(feedPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(feedPath))
    val out = fs.create(new Path(feedPath, DefFile), false) // create-only
    try out.write(s"""{"sourcePath":"$sourcePath"}""".getBytes("UTF-8"))
    finally out.close()
    import spark.implicits._
    val empty = Seq.empty[(String, String, String, String, String, Int, Int)]
      .toDF("change_id", "change", "key", "before", "after",
        "from_version", "to_version")
    ManifestTable.writeWithTxn(empty, feedPath, "change_id", 4,
      AppId, from.toLong)
  }

  private def sourceOf(spark: SparkSession, feedPath: String): String = {
    val fs = new Path(feedPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(new Path(feedPath, DefFile))
    val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    """"sourcePath":"([^"]*)"""".r.findFirstMatchIn(body).map(_.group(1))
      .getOrElse(throw new IllegalStateException(
        s"unreadable $DefFile at $feedPath"))
  }

  /** Fold every source version committed since the watermark into the
    * feed, one atomic commit per version. Returns the number of
    * versions folded (0 = already current).
    */
  def fold(spark: SparkSession, feedPath: String): Int = {
    val srcPath = sourceOf(spark, feedPath)
    val last = ManifestTable.txnVersion(spark, feedPath, AppId).getOrElse(
      throw new IllegalStateException(
        s"feed at $feedPath has no watermark — run ChangeFeed.create")).toInt
    val head = ManifestTable.headVersion(spark, srcPath).getOrElse(0)
    if (head <= last) return 0
    val keyCol = ManifestTable.currentManifest(spark, srcPath).keyCol
    var folded = 0
    (last + 1 to head).foreach { v =>
      val changes = ManifestTable.diff(spark, srcPath, keyCol, v - 1, v)
      val rows = changes.select(
        concat_ws(":", lit(v.toString), col("change"),
          col("key").cast("string")).as("change_id"),
        col("change"),
        col("key").cast("string").as("key"),
        col("before"), col("after"),
        lit(v - 1).as("from_version"), lit(v).as("to_version"))
      // empty diffs (watermark-only commits) still advance the feed's
      // watermark — appendOnce stages nothing and lands the txn update
      if (ManifestTable.appendOnce(spark, feedPath, rows, "change_id",
          AppId, v)) folded += 1
    }
    folded
  }

  /** The feed's accumulated change rows. */
  def read(spark: SparkSession, feedPath: String) =
    ManifestTable.read(spark, feedPath)
      .select("change_id", "change", "key", "before", "after",
        "from_version", "to_version")

  /** Continuous feed maintenance driven by the source's manifest
    * stream (`ignoreDeletes` keeps the DRIVING stream alive across
    * rewrites — its rows are unused; [[fold]] computes the real
    * changes from manifest diffs). `Trigger.AvailableNow` is the
    * drain-and-stop shape; replays after restart observe the feed's
    * watermark and fold nothing.
    */
  def start(spark: SparkSession, feedPath: String, checkpoint: String,
            trigger: org.apache.spark.sql.streaming.Trigger =
              org.apache.spark.sql.streaming.Trigger.ProcessingTime("10 seconds"))
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val srcPath = sourceOf(spark, feedPath)
    graft.sources.ManifestIndexSource.ensureRegistered(spark)
    spark.readStream
      .option("startingVersion", "latest")
      .option("ignoreDeletes", "true")
      .table(s"${graft.sources.ManifestIndexSource.CatalogName}.`$srcPath`")
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch((_: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                     _: Long) => { fold(spark, feedPath); () })
      .trigger(trigger)
      .start()
  }
}
