package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Sketches
import graft.sinks.ManifestTable

/** Incremental near-duplicate detection against a PERSISTED LSH index —
  * the batch-pipeline shape the streaming `NearDupStream` keeps in
  * executor state, made durable: a production corpus is not rebuilt
  * per run, it accumulates (a daily crawl lands next to a 100 TB
  * corpus), and re-sharding the accumulated corpus to dedup each new
  * batch is exactly the O(corpus)-per-batch cost this operator removes.
  *
  * The index is a [[ManifestTable]] keyed by the LSH band key
  * (`band * P1 + bandhash`), rows `(bandkey, id, sig)` — the compact
  * probe side of MinHash dedup (64 longs per doc per band), NOT the
  * documents themselves. Per batch:
  *
  *  1. `probe` prepares the batch (one kernel pass: shingle → sign →
  *     band), reads ONLY the index buckets the batch's band keys hash
  *     into (manifest-level pruning — a small batch against a large
  *     index touches a fraction of its directories), joins on the band
  *     key, and verifies candidates INLINE with the agreeing-position
  *     Jaccard estimate carried by both rows — corpus-vs-batch near-dup
  *     pairs with zero extra verification shuffle. Batch-internal pairs
  *     come from the same prepared frame via a straight band self-join.
  *  2. `append` adds the batch's own band entries to the index —
  *     O(batch) IO regardless of index size (each touched bucket's
  *     directory list grows by one staged dir; nothing is read or
  *     rewritten), with `ManifestTable.compact` bounding read fan-out
  *     after many batches.
  *
  * The touched index slice is read through
  * [[graft.sources.ManifestIndexSource]] — a DSv2 scan that REPORTS the
  * layout's `bucket(nBuckets, bandkey)` hash partitioning — so the
  * probe's band-key join plans as a storage-partitioned join: Spark
  * shuffles ONLY the batch side into the index's existing bucket
  * layout, and the per-bucket occupancy count (`occ`) aggregates the
  * slice without an exchange either. IO is O(touched buckets) on the
  * read, CPU/shuffle is O(batch) on the join — the whole incremental
  * path scales with the batch, not the index.
  */
object IncrementalDedup {

  /** One row per (band, doc): the doc's band key and full signature.
    * Carrying the 64-slot signature on every band row trades ×bands
    * storage for verification WITHOUT a signature-fetch join at probe
    * time — the index is still orders of magnitude smaller than the
    * corpus text it stands in for.
    */
  private def entriesFromPrepared(prepared: DataFrame): DataFrame =
    prepared
      .select(col("id"), col("sig"), posexplode(col("bands")).as(Seq("band", "bh")))
      .select(
        (col("band").cast("long") * Sketches.P1 + col("bh")).as("bandkey"),
        col("id"), col("sig"))

  def indexEntries(docs: DataFrame, idCol: String, textCol: String,
                   shingleN: Int, numHashes: Int, bands: Int): DataFrame =
    entriesFromPrepared(
      Dedup.prepareMinhash(docs, idCol, textCol, shingleN, numHashes, bands))

  /** Create the index over an initial corpus. */
  def buildIndex(docs: DataFrame, path: String, idCol: String, textCol: String,
                 shingleN: Int = 3, numHashes: Int = 64, bands: Int = 16,
                 nBuckets: Int = 16): Unit =
    ManifestTable.write(
      indexEntries(docs, idCol, textCol, shingleN, numHashes, bands),
      path, "bandkey", nBuckets)

  /** Append a batch's entries after it has been probed — the O(batch)
    * accumulation step.
    */
  def appendBatch(spark: SparkSession, path: String, docs: DataFrame,
                  idCol: String, textCol: String,
                  shingleN: Int = 3, numHashes: Int = 64, bands: Int = 16): Unit =
    ManifestTable.append(spark, path,
      indexEntries(docs, idCol, textCol, shingleN, numHashes, bands), "bandkey")

  /** Near-dup pairs touching the batch: corpus-vs-batch (via the index)
    * plus batch-internal (via self-join), est-Jaccard ≥ `threshold`,
    * normalized to `id_l < id_r` and distinct. The corpus side reads
    * only the index buckets the batch's band keys map to.
    */
  def probe(spark: SparkSession, path: String, batch: DataFrame,
            idCol: String, textCol: String,
            shingleN: Int = 3, numHashes: Int = 64, bands: Int = 16,
            threshold: Double = 0.5, maxBucketSize: Int = 4096): DataFrame = {
    // pinned: the prepared batch feeds three consumers (the driver-side
    // bucket collect, the cross join's probe side, and the intra leg) —
    // without the pin each would re-run the tokenize/sign kernels
    val prepared = Dedup.prepareMinhash(batch, idCol, textCol,
      shingleN, numHashes, bands).localCheckpoint()
    val entries = entriesFromPrepared(prepared)
    // manifest-level pruning: the batch's band keys resolve (driver-side,
    // ≤ nBuckets ints over the pinned `prepared`) to the only index
    // directories worth reading. readBuckets also withdraws the scan's
    // runtime-filter advertisement — measured at bench scale, the DPP
    // subquery that would otherwise recompute this same bucket set costs
    // ~0.7 s of materialize-and-replan latency vs the pre-pass's ~0.2 s
    // job, and at 100 TB both produce the identical IO cut.
    val slice = graft.sources.ManifestIndexSource.readBuckets(spark, path,
      entries.select("bandkey").distinct())
    // corpus-vs-batch: bipartite band join, one row per matching band,
    // deduped by the final grouping. The join streams k_index × k_batch
    // rows per band key — quadratic when BOTH sides mass-duplicate the
    // same content (boilerplate in the corpus AND arriving again in
    // bulk), so index band keys over `maxBucketSize` degrade to their
    // MIN-ID HUB member, the same connectivity-preserving star (and the
    // same contract) as `Dedup.candidatePairs`: a batch doc near a
    // mass-dup corpus block still pairs with the block's hub — no false
    // positives, possibly fewer distinct cross-pairs inside the block.
    // The occupancy count is a WINDOW over the slice, not a second
    // aggregate-and-join of it: a self-join would plan TWO BatchScans of
    // the index (the r7 regression — every index byte decoded twice),
    // while the window reuses the single scan and, because the scan
    // reports the layout's bucket partitioning, needs no exchange either
    // (KeyGroupedPartitioning satisfies the window's clustering).
    val w = org.apache.spark.sql.expressions.Window.partitionBy("bandkey")
    val capped = slice
      .withColumn("k", count(lit(1)).over(w))
      .withColumn("hub_id", min("id").over(w))
      .filter(col("k") <= maxBucketSize || col("id") === col("hub_id"))
      .select("bandkey", "id", "sig")
    val cross = capped.alias("o").join(entries.alias("n"),
        col("o.bandkey") === col("n.bandkey"))
      .filter(col("o.id") =!= col("n.id"))
      .select(
        least(col("o.id"), col("n.id")).as("id_l"),
        greatest(col("o.id"), col("n.id")).as("id_r"),
        Dedup.estJaccard(col("o.sig"), col("n.sig"), numHashes).as("est_jaccard"))
    // batch-internal pairs go through the shared estVerifiedPairs funnel
    // (candidatePairs' singleton drop + mega-bucket star) — a degenerate
    // batch of thousands of identical docs stays linear, same as the
    // whole-corpus pipelines
    val intra = Dedup.estVerifiedPairs(prepared, numHashes, threshold)
    cross.filter(col("est_jaccard") >= threshold)
      .unionByName(intra)
      .groupBy("id_l", "id_r").agg(max("est_jaccard").as("est_jaccard"))
  }
}
