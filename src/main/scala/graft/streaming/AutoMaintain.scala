package graft.streaming

import org.apache.spark.sql.SparkSession

import graft.sinks.ManifestTable

/** Hands-off layout upkeep — the auto-OPTIMIZE story: a lightweight
  * streaming driver watches a manifest table's OWN commit stream and
  * runs [[ManifestTable.maintain]]'s advised set whenever its vitals
  * degrade (small-file fragmentation or merge-on-read tombstones →
  * OPTIMIZE, history depth → VACUUM). Same drive shape as
  * [[graft.sinks.MaterializedAgg.startContinuous]] and
  * [[ChangeFeed.start]]: offsets are table versions, so the policy
  * wakes exactly when commits exist and is idle otherwise; the
  * micro-batch rows are deliberately unused (`ignoreDeletes` keeps the
  * driving stream alive across the maintainer's own rewrites and any
  * concurrent row-level writes).
  *
  * Self-feedback is convergent by construction: maintain()'s own
  * commits retrigger the policy, which then reads HEALTHY vitals and
  * does nothing — [[ManifestTable.maintenanceAdvice]] advises only
  * work that changes state, so the loop reaches a fixpoint instead of
  * compacting forever. `Trigger.AvailableNow` is the drain-and-stop
  * shape for scheduled maintenance windows.
  */
object AutoMaintain {

  def start(spark: SparkSession, path: String, checkpoint: String,
            targetFileBytes: Long = 128L << 20,
            maxVersions: Int = 10, keepVersions: Int = 2,
            trigger: org.apache.spark.sql.streaming.Trigger =
              org.apache.spark.sql.streaming.Trigger.ProcessingTime("60 seconds"))
      : org.apache.spark.sql.streaming.StreamingQuery = {
    graft.sources.ManifestIndexSource.ensureRegistered(spark)
    spark.readStream
      .option("startingVersion", "latest")
      .option("ignoreDeletes", "true")
      .table(s"${graft.sources.ManifestIndexSource.CatalogName}.`$path`")
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch((_: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                     _: Long) => {
        ManifestTable.maintain(spark, path, targetFileBytes, maxVersions,
          keepVersions)
        ()
      })
      .trigger(trigger)
      .start()
  }

  /** Hands-off upkeep for a PERSISTED INDEX (bm25/ivf/ivfpq): the
    * driving stream watches the index's SOURCE CORPUS commit stream —
    * the events that make an index stale are corpus commits, not index
    * commits — and each wake runs [[graft.ops.IndexAudit.maintainIndex]]
    * (REFRESH when the sync watermark trails the corpus head, then the
    * lists table's own layout upkeep). Same convergence argument as
    * [[start]]: a refresh advances the watermark to the head it just
    * saw, so the re-triggered policy reads fresh vitals and idles — and
    * the index's own commits are invisible to the driver (it watches
    * the corpus), so there is no self-feedback loop at all.
    */
  def startIndex(spark: SparkSession, indexPath: String, checkpoint: String,
                 targetFileBytes: Long = 128L << 20,
                 maxVersions: Int = 10, keepVersions: Int = 2,
                 trigger: org.apache.spark.sql.streaming.Trigger =
                   org.apache.spark.sql.streaming.Trigger.ProcessingTime("60 seconds"))
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val (_, d, _) = graft.ops.IndexAudit.indexLayout(spark, indexPath)
    val corpus = d("sourcePath")
    graft.sources.ManifestIndexSource.ensureRegistered(spark)
    spark.readStream
      .option("startingVersion", "latest")
      .option("ignoreDeletes", "true")
      .table(s"${graft.sources.ManifestIndexSource.CatalogName}.`$corpus`")
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch((_: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                     _: Long) => {
        graft.ops.IndexAudit.maintainIndex(spark, indexPath,
          targetFileBytes, maxVersions, keepVersions)
        ()
      })
      .trigger(trigger)
      .start()
  }
}
