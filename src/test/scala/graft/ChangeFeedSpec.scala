package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sinks.ManifestTable
import graft.streaming.ChangeFeed

/** The change-data-feed contract: per-version granularity (consecutive
  * updates to one key are distinct feed rows), exact insert/update/
  * delete classification with before/after JSON, exactly-once folding
  * under replay and restart, and a streaming driver that drains with
  * `AvailableNow`.
  */
class ChangeFeedSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String) = s"${Files.createTempDirectory(s"graft-cdc-$p")}/t"

  private def feedRows(feed: String): Seq[(Int, String, String)] =
    ChangeFeed.read(spark, feed)
      .select("to_version", "change", "key")
      .as[(Int, String, String)].collect().toSeq.sorted

  test("per-version changes: insert/update/delete classified, replays fold nothing") {
    val src = tmp("src"); val feed = tmp("feed")
    ManifestTable.write(
      (0 until 20).map(i => (i.toLong, s"n-$i")).toDF("id", "name"),
      src, "id", 4)                                      // v1
    ChangeFeed.create(spark, feed, src)                  // watermark = 1

    ManifestTable.append(spark, src,
      Seq((100L, "new")).toDF("id", "name"), "id")       // v2: insert
    ManifestTable.upsert(spark, src,
      Seq((5L, "u-5")).toDF("id", "name"), "id")         // v3: update
    ManifestTable.upsert(spark, src,
      Seq((5L, "u-5b")).toDF("id", "name"), "id")        // v4: update again
    ManifestTable.deleteKeys(spark, src, Seq(7L).toDF("id"), "id") // v5: delete

    assert(ChangeFeed.fold(spark, feed) == 4, "four versions to fold")
    val got = feedRows(feed)
    assert(got == Seq(
      (2, "insert", "100"),
      (3, "update", "5"),
      (4, "update", "5"), // per-version granularity: NOT collapsed
      (5, "delete", "7")), s"unexpected feed: $got")

    // before/after carry the row JSON on the right sides
    val u5 = ChangeFeed.read(spark, feed)
      .filter(col("to_version") === 4).select("before", "after")
      .as[(String, String)].head()
    assert(u5._1.contains("u-5") && u5._2.contains("u-5b"))
    val del = ChangeFeed.read(spark, feed)
      .filter(col("change") === "delete").select("before", "after")
      .as[(String, String)].head()
    assert(del._1.contains("n-7") && del._2 == null)

    // replay: nothing to fold, nothing duplicated
    assert(ChangeFeed.fold(spark, feed) == 0)
    assert(feedRows(feed).size == 4)
  }

  test("streaming driver drains with AvailableNow; restart replays are no-ops") {
    val src = tmp("src2"); val feed = tmp("feed2")
    ManifestTable.write(
      (0 until 10).map(i => (i.toLong, i * 1.0)).toDF("id", "v"), src, "id", 2)
    ChangeFeed.create(spark, feed, src)
    ManifestTable.append(spark, src, Seq((50L, 5.0)).toDF("id", "v"), "id")
    ManifestTable.upsert(spark, src, Seq((1L, 9.9)).toDF("id", "v"), "id")

    val ckpt = s"${Files.createTempDirectory("graft-cdc-ckpt")}/c"
    ChangeFeed.start(spark, feed, ckpt,
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .awaitTermination(120000)
    assert(feedRows(feed).map(r => (r._2, r._3)).toSet ==
      Set(("insert", "50"), ("update", "1")))

    // restart over the same checkpoint AND a fresh one: the feed's own
    // watermark makes replays no-ops either way
    ChangeFeed.start(spark, feed, ckpt,
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .awaitTermination(120000)
    ChangeFeed.start(spark, feed,
        s"${Files.createTempDirectory("graft-cdc-ckpt")}/c2",
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .awaitTermination(120000)
    assert(feedRows(feed).size == 2, "replays must not duplicate")

    // and the stream keeps folding NEW commits
    ManifestTable.deleteKeys(spark, src, Seq(2L).toDF("id"), "id")
    ChangeFeed.start(spark, feed,
        s"${Files.createTempDirectory("graft-cdc-ckpt")}/c3",
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .awaitTermination(120000)
    assert(feedRows(feed).map(r => (r._2, r._3)).toSet ==
      Set(("insert", "50"), ("update", "1"), ("delete", "2")))
  }

  test("downstream consumers stream the feed itself (append-only by construction)") {
    val src = tmp("src4"); val feed = tmp("feed4")
    ManifestTable.write(
      (0 until 10).map(i => (i.toLong, s"n-$i")).toDF("id", "name"), src, "id", 2)
    ChangeFeed.create(spark, feed, src)
    ManifestTable.upsert(spark, src, Seq((2L, "x")).toDF("id", "name"), "id")
    ManifestTable.deleteKeys(spark, src, Seq(3L).toDF("id"), "id")
    ChangeFeed.fold(spark, feed)
    // the feed is an appendOnce-written manifest table — append-only by
    // construction — so a consumer subscribes with an ordinary manifest
    // STREAM read; no special CDC reader needed
    graft.sources.ManifestIndexSource.ensureRegistered(spark)
    val out = s"${Files.createTempDirectory("graft-cdc-out")}/sink"
    spark.readStream.option("startingVersion", "0")
      .table(s"${graft.sources.ManifestIndexSource.CatalogName}.`$feed`")
      .writeStream
      .option("checkpointLocation",
        s"${Files.createTempDirectory("graft-cdc-out")}/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .format("parquet").option("path", out)
      .start().awaitTermination(120000)
    val streamed = spark.read.parquet(out)
      .select("change", "key").as[(String, String)].collect().toSet
    assert(streamed == Set(("update", "2"), ("delete", "3")),
      s"streamed feed rows: $streamed")
  }

  test("feed over SQL row-level statements captures their semantics; SQL verbs drive it") {
    val src = tmp("src3"); val feed = tmp("feed3")
    ManifestTable.write(
      (0 until 10).map(i => (i.toLong, s"n-$i")).toDF("id", "name"), src, "id", 2)
    // created and refreshed entirely from SQL: CREATE CHANGE FEED plus
    // the polymorphic REFRESH (feed tables fold, agg views refresh)
    spark.sql(s"GRAFT CREATE CHANGE FEED '$feed' FROM '$src'")
    graft.sources.ManifestIndexSource.ensureRegistered(spark)
    val cat = graft.sources.ManifestIndexSource.CatalogName
    spark.sql(s"UPDATE $cat.`$src` SET name = 'sql-up' WHERE id = 3")
    spark.sql(s"DELETE FROM $cat.`$src` WHERE id = 4")
    val r = spark.sql(s"GRAFT REFRESH '$feed'").collect().head
    assert(r.getString(2) == "true")
    assert(feedRows(feed).map(x => (x._2, x._3)).toSet ==
      Set(("update", "3"), ("delete", "4")))
    val r2 = spark.sql(s"GRAFT REFRESH '$feed'").collect().head
    assert(r2.getString(2) == "false", "current feed must report false")
  }

  test("a RESTORE folds as its compensating changes — CDC sees the rollback") {
    val src = tmp("rst-src"); val feed = tmp("rst-feed")
    ManifestTable.write(
      (0 until 10).map(i => (i.toLong, s"n-$i")).toDF("id", "name"),
      src, "id", 4)
    val v1 = ManifestTable.currentManifest(spark, src).version
    ChangeFeed.create(spark, feed, src)
    ManifestTable.append(spark, src,
      Seq((100L, "new")).toDF("id", "name"), "id")                 // +1
    ManifestTable.upsert(spark, src,
      Seq((5L, "u-5")).toDF("id", "name"), "id")                   // +2
    ManifestTable.deleteKeys(spark, src, Seq(7L).toDF("id"), "id") // +3
    ManifestTable.restore(spark, src, v1)                          // +4
    assert(ChangeFeed.fold(spark, feed) == 4)
    // the rollback version's feed rows are exactly the compensations:
    // the appended row deletes, the deleted row re-inserts, the
    // updated row reverts — a downstream replica folding the feed
    // converges to the restored state with no special-casing
    val got = feedRows(feed).filter(_._1 == v1 + 4)
    assert(got == Seq(
      (v1 + 4, "delete", "100"),
      (v1 + 4, "insert", "7"),
      (v1 + 4, "update", "5")), s"unexpected rollback changes: $got")
    val u5 = ChangeFeed.read(spark, feed)
      .filter(col("to_version") === (v1 + 4) && col("change") === "update")
      .select("after").as[String].head()
    assert(u5.contains("n-5"), "the revert's after-image is the original row")
  }
}
