package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Streaming NEAR-dup detection — the online counterpart of
  * `ops.Dedup.simhashNearDupPairs` (the exact-dup stream is
  * `DedupStream`): documents arrive as a stream, and the query
  * continuously emits every pair within SimHash Hamming ≤ maxDist among
  * all documents seen so far, regardless of how arrivals interleave.
  *
  * Shape: each doc fans out to its 4 fifteen-bit SimHash band keys, and
  * keyed state per (band, bandhash) bucket holds that bucket's members —
  * a new doc compares ONLY against its own buckets (the same pigeonhole
  * guarantee as the batch operator: Hamming ≤ 3 ⇒ ≥ 1 shared band), so
  * per-doc work is bucket-occupancy, never corpus-size. State scales out
  * on the band-key shuffle exactly like the batch candidate join; a
  * finite dedup horizon is available through `ttlMs`: bucket members
  * older than the TTL are pruned before matching (lazy, per-member), and
  * buckets idle past the TTL are evicted wholesale through
  * `GroupStateTimeout.ProcessingTimeTimeout` — same two-pronged scheme
  * as `DedupStream`. Default (`ttlMs = None`) keeps unbounded state.
  *
  * A pair that shares several bands would surface once per shared band
  * (and Spark disallows chaining a second stateful dedup behind
  * `flatMapGroupsWithState`), so the sink makes the output exactly-once
  * instead: each micro-batch is deduped and anti-joined against the
  * already-written pairs before appending — an idempotent upsert. The
  * accumulated output is HASH-BUCKETED on the pair key
  * (`bucket = pmod(xxhash64(id_l, id_r), nBuckets)`, hive-partition
  * directories — the `BucketedTable` layout), and each micro-batch
  * anti-joins only the buckets its own pairs hash into: the re-read is
  * bounded by the batch's bucket fan-out, not by the total accumulated
  * output. This is the plain-parquet stand-in for a keyed MERGE on an
  * ACID table (Delta/Iceberg) in production — same note as the keyed
  * sinks in `Sinks`.
  */
object NearDupStream {

  case class BandedDoc(band: Int, bh: Long, doc_id: Long, sh: Long)
  case class BucketState(members: List[(Long, Long, Long)]) // (doc_id, simhash, seenMs)
  case class NearDupPair(id_l: Long, id_r: Long, dist: Int)

  /** Per-bucket matcher: compare each arriving doc against the bucket's
    * live members (state + earlier rows of this batch, in ascending-id
    * order so in-batch results are arrival-order-independent), then add
    * it. With a TTL, members older than the horizon are pruned first —
    * they no longer match, and a re-arrival of the same id is treated as
    * a fresh document.
    */
  private[graft] def matchBucket(maxDist: Int, ttlMs: Option[Long] = None)(
      key: (Int, Long), docs: Iterator[BandedDoc],
      state: GroupState[BucketState]): Iterator[NearDupPair] = {
    if (state.hasTimedOut) { // bucket idle past the TTL: evict wholesale
      state.remove()
      Iterator.empty
    } else {
      val now = ttlMs.map(_ => state.getCurrentProcessingTimeMs()).getOrElse(0L)
      var members = state.getOption.map(_.members).getOrElse(Nil)
      ttlMs.foreach(t => members = members.filter(m => now - m._3 <= t))
      val out = scala.collection.mutable.ArrayBuffer[NearDupPair]()
      docs.toSeq.sortBy(_.doc_id).foreach { d =>
        if (!members.exists(_._1 == d.doc_id)) {
          members.foreach { case (pid, psh, _) =>
            val dist = java.lang.Long.bitCount(psh ^ d.sh)
            if (dist <= maxDist)
              out += NearDupPair(math.min(pid, d.doc_id), math.max(pid, d.doc_id), dist)
          }
          members = (d.doc_id, d.sh, now) :: members
        }
      }
      state.update(BucketState(members))
      ttlMs.foreach(t => state.setTimeoutDuration(t))
      out.iterator
    }
  }

  /** The banded matching transform on any (doc_id, text) Dataset. */
  def nearDupPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxDist: Int = 3, ttlMs: Option[Long] = None): Dataset[NearDupPair] = {
    import docs.sparkSession.implicits._
    val banded = docs
      .select(col(idCol).as("doc_id"),
        graft.functions.Sketches.simhash(col(textCol)).as("sh"))
      .select(col("doc_id"), col("sh"),
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("band"),
            shiftright(col("sh"), b * 15).bitwiseAND(0x7FFFL).as("bh"))): _*)).as("bk"))
      .select(col("bk.band"), col("bk.bh"), col("doc_id"), col("sh"))
      .as[BandedDoc]
    val timeout =
      if (ttlMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    banded.groupByKey(d => (d.band, d.bh))
      .flatMapGroupsWithState(OutputMode.Append, timeout)(
        matchBucket(maxDist, ttlMs))
  }

  /** Start the stream: one `doc_id<TAB>text` line per document under
    * `landingDir` → `outPath` accumulates the distinct near-dup pairs
    * (exactly-once via the idempotent sink; keyed bucket state survives
    * restarts through the checkpoint).
    */
  def start(spark: SparkSession, landingDir: String, outPath: String,
            checkpoint: String, maxDist: Int = 3,
            nBuckets: Int = 64, ttlMs: Option[Long] = None): StreamingQuery = {
    val docs = spark.readStream
      .schema("value STRING")
      .text(landingDir)
      .select(
        split(col("value"), "\t").getItem(0).cast("long").as("doc_id"),
        split(col("value"), "\t").getItem(1).as("text"))
    nearDupPairs(docs, "doc_id", "text", maxDist, ttlMs).writeStream
      .trigger(Trigger.AvailableNow())
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[NearDupPair], _: Long) =>
        val spark = batch.sparkSession
        val fresh = batch.dropDuplicates("id_l", "id_r")
          .withColumn("bucket", pmod(xxhash64(col("id_l"), col("id_r")), lit(nBuckets)))
          .localCheckpoint() // two readers below (bucket probe + write)
        // existence is checked EXPLICITLY: a transient read failure
        // (listing error, corrupt footer) must abort the batch — the
        // old catch-all treated it as "no output yet" and re-appended
        // duplicates, silently breaking the exactly-once contract
        val hadoopPath = new org.apache.hadoop.fs.Path(outPath)
        val fs = hadoopPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val toWrite =
          if (!fs.exists(hadoopPath)) fresh.toDF()
          else {
            // read ONLY the hive-partition buckets this batch touches —
            // partition pruning keeps the anti-join input proportional
            // to the batch, not to everything accumulated so far
            val touched = fresh.select("bucket").distinct()
              .collect().map(_.getLong(0)) // bounded by nBuckets
            val existing = spark.read.parquet(outPath)
              .filter(col("bucket").isin(touched: _*))
              .select("id_l", "id_r")
            fresh.join(existing, Seq("id_l", "id_r"), "left_anti")
          }
        toWrite.write.mode("append").partitionBy("bucket").parquet(outPath)
        ()
      }
      .start()
  }
}
