package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.sinks.ManifestTable
import graft.sources.ManifestIndexSource

/** Storage-layer soak at ~10M rows — two orders of magnitude past the
  * other suites' fixtures (VERDICT r10 #7): the scale claims the small
  * specs pin per-mechanism are asserted here as MEASURED RATIOS on one
  * big fragmented table: zero-listing planning, bucket pruning to
  * 1/32, bloom sidecars dropping the fragmented bucket's cold dirs,
  * and an end-to-end point-lookup latency bound. Build cost is one
  * ~10M-row write plus six appends (~1 min), paid once for the suite.
  */
class StorageSoakSpec extends SparkSpec {

  private val nBuckets = 32
  private val baseRows = 10L * 1000 * 1000

  private lazy val path: String = {
    val p = s"${Files.createTempDirectory("graft-soak")}/tbl"
    val base = spark.range(0, baseRows).select(
      col("id"),
      concat(lit("src-"), pmod(col("id"), lit(13))).as("source"),
      (col("id") % 997).as("len"))
    ManifestTable.write(base, p, "id", nBuckets, bloomCols = Seq("id"))
    // six appends fragment every bucket to 7 dirs — the append-heavy
    // shape whose lookup cost the bloom ladder exists to bound
    (0 until 6).foreach { i =>
      val lo = baseRows + i * 100000L
      ManifestTable.append(spark, p,
        spark.range(lo, lo + 100000L).select(col("id"),
          lit(s"late-$i").as("source"), (col("id") % 997).as("len")),
        "id")
    }
    p
  }

  private def scanDescription(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan
      .collect { case b: BatchScanExec => b.scan.description() }
      .mkString(" ")
  }

  test("soak: zero-listing planning, 1/32 bucket cut, bloom dir cut, latency bound") {
    ManifestIndexSource.ensureRegistered(spark)
    val m = ManifestTable.currentManifest(spark, path)
    assert(m.buckets.size == nBuckets &&
      m.buckets.values.forall(_.size == 7), "7 dirs per bucket expected")
    assert(m.totalRows.contains(baseRows + 600000L),
      "metadata row count must be exact at this scale")

    // planning the keyed lookup does ZERO filesystem listings — the
    // manifest file lists carry everything (spec-pinned small; held at
    // soak scale here)
    val victim = baseRows + 5 * 100000L + 17 // lives in exactly one dir
    val before = ManifestIndexSource.planListings.get
    val lookup = ManifestIndexSource.read(spark, path)
      .filter(col("id") === victim)
    val t0 = System.nanoTime()
    val desc = scanDescription(lookup)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(ManifestIndexSource.planListings.get == before,
      "soak-scale planning must not list directories")

    // bucket cut: 1 of 32 planned
    assert(desc.contains(s"buckets=1/$nBuckets"),
      s"point lookup must prune to one bucket: $desc")
    // bloom cut: the key exists in ONE of the bucket's 7 dirs; sidecars
    // must drop most of the rest (fpp leaves at most a stray survivor)
    val dirsRe = "dirs=(\\d+)/(\\d+)".r
    val kept = dirsRe.findFirstMatchIn(desc).map(_.group(1).toInt)
    assert(kept.exists(_ <= 3),
      s"bloom sidecars must cut the fragmented bucket's dirs: $desc")
    // end-to-end latency (manifest read + plan + 1-2 files): generous
    // bound, catches an accidental return to scan-the-bucket
    assert(secs < 10.0, s"10M-row point lookup took ${secs}s")

    // correctness at the end of the ladder
    assert(lookup.select("source").collect().map(_.getString(0)).toSeq ==
      Seq("late-5"))
  }

  test("soak: NDV registers hold at 10M keys (merged estimate within sketch error)") {
    val m = ManifestTable.currentManifest(spark, path)
    assert(m.buckets.values.flatten.forall(d =>
      m.dirNdv.get(d).exists(_.contains("id"))),
      "every soak dir needs an id sketch")
    val dirs = m.buckets.values.flatten.toSeq
    val est = ManifestTable.mergedNdv(m, dirs, "id").map(_._1).getOrElse(0L)
    val truth = baseRows + 600000L
    assert(math.abs(est - truth).toDouble / truth < 0.15,
      s"merged HLL (lgK=8, ~6.5% RSE) estimated $est for $truth keys")
  }

  test("soak: full-scan aggregate agrees with metadata and stays listing-free") {
    ManifestIndexSource.ensureRegistered(spark)
    val before = ManifestIndexSource.planListings.get
    val got = ManifestIndexSource.read(spark, path)
      .agg(count(lit(1)), sum("len")).head()
    assert(ManifestIndexSource.planListings.get == before)
    assert(got.getLong(0) == baseRows + 600000L)
    val expectedSum = (0L until (baseRows + 600000L))
      .iterator.map(_ % 997).sum // closed-form check would be opaque
    assert(got.getLong(1) == expectedSum)
  }

  test("soak: VERIFY's fast audit passes and stays metadata-bounded at 10M rows") {
    val m = ManifestTable.currentManifest(spark, path)
    val nDirs = m.buckets.values.flatten.toSeq.distinct.size
    val t0 = System.nanoTime()
    val results = ManifestTable.verifyTable(spark, path, deep = false)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(results.nonEmpty && results.forall(_._2),
      s"soak table must verify clean: ${results.filterNot(_._2)}")
    // fast VERIFY is O(dirs + files) metadata calls, never a data read:
    // 224 dirs (+ sidecar probes) must audit in seconds even at 10M rows
    assert(secs < 30.0,
      s"fast VERIFY of $nDirs dirs took ${secs}s — a data read snuck in")
  }
}
