package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sinks.{ManifestTable, MaterializedAgg}
import graft.sinks.MaterializedAgg.AggSpec

/** The materialized view's one invariant: after any sequence of source
  * appends + refreshes, `read(view)` equals the from-scratch groupBy of
  * the source — while each refresh only folds the delta. Exactly-once
  * matters most at the crash boundary: the merged states and the
  * consumed source version land in one commit, so replays are no-ops.
  * Non-append source changes must be REFUSED (incremental folding can't
  * subtract) and healed by rebuild.
  */
class MaterializedAggSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String) =
    s"${Files.createTempDirectory(s"graft-mv-$tag")}/t"

  private def rows(ids: Range, cat: Long => String): DataFrame =
    ids.map(i => (i.toLong, cat(i.toLong), i * 1.0)).toDF("id", "cat", "val")

  private val aggs = Seq(AggSpec("count"), AggSpec("sum", "val"),
    AggSpec("min", "val"), AggSpec("max", "val"))

  private def recompute(src: String): Set[(String, Long, Double, Double, Double)] =
    ManifestTable.read(spark, src)
      .groupBy("cat").agg(count(lit(1)).as("count_all"),
        sum("val").as("sum_val"), min("val").as("min_val"),
        max("val").as("max_val"))
      .as[(String, Long, Double, Double, Double)].collect().toSet

  private def viewContents(view: String): Set[(String, Long, Double, Double, Double)] =
    MaterializedAgg.read(spark, view)
      .as[(String, Long, Double, Double, Double)].collect().toSet

  test("create == full recompute; refresh folds only new versions and is idempotent") {
    val src = tmp("src"); val view = tmp("view")
    ManifestTable.write(rows(0 until 300, i => s"c${i % 5}"), src, "id", 4)
    MaterializedAgg.create(spark, view, src, Seq("cat"), aggs, nBuckets = 4)
    assert(viewContents(view) == recompute(src), "initial load")

    // two appends: one extends existing groups, one adds a NEW group
    ManifestTable.append(spark, src, rows(300 until 400, i => s"c${i % 5}"), "id")
    ManifestTable.append(spark, src, rows(400 until 420, _ => "brand-new"), "id")
    assert(MaterializedAgg.refresh(spark, view), "refresh must fold new data")
    assert(viewContents(view) == recompute(src), "post-refresh equivalence")

    // idempotent: nothing new → no commit, watermark already at head
    val v = ManifestTable.versions(spark, view).last
    assert(!MaterializedAgg.refresh(spark, view), "no-op refresh must report false")
    assert(ManifestTable.versions(spark, view).last == v,
      "no-op refresh must not commit")

    // a replayed merge (same appId + version) is a no-op — the crash-
    // between-apply-and-record window cannot double count
    val replayed = ManifestTable.upsertOnce(spark, view,
      MaterializedAgg.read(spark, view)
        .withColumn(MaterializedAgg.GroupKeyCol,
          to_json(struct(col("cat")))),
      MaterializedAgg.GroupKeyCol, "graft-mv-refresh",
      ManifestTable.versions(spark, src).last.toLong)
    assert(!replayed, "watermark must reject the replayed batch")
    assert(viewContents(view) == recompute(src))
  }

  test("null group values form their own group; multi-column groups key deterministically") {
    val src = tmp("src2"); val view = tmp("view2")
    val df = Seq((1L, "a", "x", 1.0), (2L, null.asInstanceOf[String], "x", 2.0),
      (3L, "a", null.asInstanceOf[String], 3.0), (4L, null.asInstanceOf[String], "x", 4.0))
      .toDF("id", "cat", "sub", "val")
    ManifestTable.write(df, src, "id", 2)
    MaterializedAgg.create(spark, view, src, Seq("cat", "sub"),
      Seq(AggSpec("count"), AggSpec("sum", "val")), nBuckets = 2)
    val got = MaterializedAgg.read(spark, view)
      .as[(Option[String], Option[String], Long, Double)].collect().toSet
    assert(got == Set((Some("a"), Some("x"), 1L, 1.0),
      (None, Some("x"), 2L, 6.0), (Some("a"), None, 1L, 3.0)),
      s"null groups wrong: $got")
    ManifestTable.append(spark, src,
      Seq((5L, null.asInstanceOf[String], "x", 10.0)).toDF("id", "cat", "sub", "val"), "id")
    assert(MaterializedAgg.refresh(spark, view))
    val after = MaterializedAgg.read(spark, view)
      .filter(col("cat").isNull && col("sub") === "x")
      .as[(Option[String], Option[String], Long, Double)].collect().toSeq
    assert(after == Seq((None, Some("x"), 3L, 16.0)),
      s"null-group merge wrong: $after")
  }

  test("continuous refresh: the source stream triggers refresh; restart replays are no-ops") {
    val src = tmp("src4"); val view = tmp("view4")
    val ckpt = Files.createTempDirectory("graft-mv-ck").toString
    ManifestTable.write(rows(0 until 100, i => s"c${i % 4}"), src, "id", 2)
    MaterializedAgg.create(spark, view, src, Seq("cat"), aggs, nBuckets = 2)

    ManifestTable.append(spark, src, rows(100 until 160, i => s"c${i % 4}"), "id")
    ManifestTable.append(spark, src, rows(160 until 200, _ => "late"), "id")
    def drain(): Unit = {
      val q = MaterializedAgg.startContinuous(spark, view, ckpt,
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      q.awaitTermination()
    }
    drain()
    assert(viewContents(view) == recompute(src), "stream-triggered refresh")

    // restart with the SAME checkpoint and no new data: nothing commits
    val v = ManifestTable.versions(spark, view).last
    drain()
    assert(ManifestTable.versions(spark, view).last == v,
      "replayed trigger must be a no-op")

    // a fresh checkpoint re-delivers old versions; the refresh
    // watermark still makes folding them a no-op (no double counting)
    val ckpt2 = Files.createTempDirectory("graft-mv-ck2").toString
    ManifestTable.append(spark, src, rows(200 until 220, _ => "late"), "id")
    val q2 = MaterializedAgg.startContinuous(spark, view, ckpt2,
      org.apache.spark.sql.streaming.Trigger.AvailableNow())
    q2.awaitTermination()
    assert(viewContents(view) == recompute(src), "fresh-checkpoint drain exact")
  }

  test("non-append source changes are refused with the rebuild hint; rebuild heals") {
    val src = tmp("src3"); val view = tmp("view3")
    ManifestTable.write(rows(0 until 100, i => s"c${i % 3}"), src, "id", 2)
    MaterializedAgg.create(spark, view, src, Seq("cat"), aggs, nBuckets = 2)

    ManifestTable.upsert(spark, src,
      Seq((5L, "c0", 999.0)).toDF("id", "cat", "val"), "id")
    val e = intercept[IllegalStateException] { MaterializedAgg.refresh(spark, view) }
    assert(e.getMessage.contains("rebuild"), s"need the rebuild hint: ${e.getMessage}")

    MaterializedAgg.rebuild(spark, view)
    assert(viewContents(view) == recompute(src), "rebuild must recompute exactly")

    // equality deletes are also non-append for the view
    ManifestTable.deleteKeys(spark, src, Seq(7L).toDF("id"), "id")
    intercept[IllegalStateException] { MaterializedAgg.refresh(spark, view) }
    MaterializedAgg.rebuild(spark, view)
    assert(viewContents(view) == recompute(src))

    // and the incremental path works again after healing
    ManifestTable.append(spark, src, rows(100 until 150, i => s"c${i % 3}"), "id")
    assert(MaterializedAgg.refresh(spark, view))
    assert(viewContents(view) == recompute(src))
  }

  test("a quote in any def-embedded name is refused before a corrupt _view.json is written") {
    val src = tmp("src4"); val view = tmp("view4")
    ManifestTable.write(rows(0 until 10, i => s"c$i"), src, "id", 2)
    // agg columns embed in the same quoted JSON as group columns: an
    // unchecked '"' would mis-parse on every later refresh (ADVICE r10)
    intercept[IllegalArgumentException] {
      MaterializedAgg.create(spark, view, src, Seq("cat"),
        Seq(MaterializedAgg.AggSpec("sum", "va\"l")), nBuckets = 2)
    }
    assert(ManifestTable.headVersion(spark, view).isEmpty,
      "refused create must leave no view behind")
  }

  test("refresh across RESTORE: above-watermark folds exactly, below refuses and rebuild heals") {
    val src = tmp("rst-src"); val view = tmp("rst-view")
    ManifestTable.write(rows(0 until 100, i => s"c${i % 3}"), src, "id", 4)
    val v1 = ManifestTable.currentManifest(spark, src).version
    MaterializedAgg.create(spark, view, src, Seq("cat"), aggs, nBuckets = 4)

    // two appends, the second rolled back BEFORE any refresh: the net
    // state change since the watermark is still append-only (pointers
    // only added), so the incremental path folds exactly the SURVIVING
    // delta — a restore above the watermark needs no special handling
    ManifestTable.append(spark, src, rows(100 until 150, i => s"c${i % 3}"), "id")
    ManifestTable.append(spark, src, rows(150 until 200, i => s"c${i % 3}"), "id")
    ManifestTable.restore(spark, src, v1 + 1)
    assert(MaterializedAgg.refresh(spark, view))
    assert(viewContents(view) == recompute(src),
      "fold across an above-watermark restore")

    // rolling back BELOW the watermark removes dirs the view already
    // folded — incremental refresh cannot subtract, so it must refuse
    // with the rebuild demand rather than silently double-count
    ManifestTable.restore(spark, src, v1)
    val e = intercept[IllegalStateException] {
      MaterializedAgg.refresh(spark, view)
    }
    assert(e.getMessage.contains("rebuild"))
    MaterializedAgg.rebuild(spark, view)
    assert(viewContents(view) == recompute(src), "rebuild heals the rollback")
    assert(!MaterializedAgg.refresh(spark, view), "current after rebuild")
  }
}
