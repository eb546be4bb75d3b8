package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media as opaque `BINARY` columns with typed
  * metadata, batch-shaped decode/feature-extract over partitions.
  *
  * The Spark-side plumbing is real — schema, partitioning, batch shape —
  * while the decoder itself is a clearly-marked deterministic stub
  * (codec libraries aren't in this container). Swapping `decodeStub` for
  * a real JNI/FFmpeg/libvips call changes nothing upstream: partitions
  * arrive as bounded batches sized for decoder memory, exactly how a
  * vectorized (pandas-style) UDF would receive them.
  */
object Multimodal {

  case class MediaRecord(media_id: Long, media: Array[Byte], format: String,
                         n_bytes: Long, source: String)

  case class MediaFeatures(media_id: Long, format: String, n_bytes: Long,
                           byte_mean: Double, head: Array[Byte],
                           features: Array[Float])

  /** Wrap the documents fixture as a media table: text bytes as the
    * opaque payload, format derived from the source id. At 100 TB the
    * payload column stays unread unless projected — parquet column
    * pruning is what makes a mixed relational/media table workable.
    */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("media"),
      element_at(array(lit("png"), lit("jpeg"), lit("wav"), lit("mp4")),
        (col("doc_id") % 4 + 1).cast("int")).as("format"),
      octet_length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"),
      col("source"))

  /** Batch-shaped feature extraction: partitions are processed in bounded
    * batches (the decode working set), each batch "decoded" by the stub.
    * This is the Scala analog of `mapInPandas` — same batch contract,
    * JVM-native instead of Arrow+Python.
    */
  def extractFeatures(records: Dataset[MediaRecord],
                      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.grouped(batchSize).flatMap(decodeStub)
    }
  }

  /** STUB decoder — deterministic fake in place of a real codec.
    * Real implementation would hand `batch.map(_.media)` to the codec
    * library here; everything around it (batching, schema, laziness)
    * is production-shaped.
    */
  private[ops] def decodeStub(batch: Seq[MediaRecord]): Seq[MediaFeatures] =
    batch.map { r =>
      val bytes = r.media
      val mean = if (bytes.isEmpty) 0.0
        else bytes.foldLeft(0L)((a, b) => a + (b & 0xFF)).toDouble / bytes.length
      // fake "embedding": 4 coarse byte-histogram buckets, normalized
      val hist = new Array[Float](4)
      bytes.foreach(b => hist((b & 0xFF) / 64) += 1f)
      val n = math.max(1, bytes.length).toFloat
      MediaFeatures(r.media_id, r.format, bytes.length.toLong, mean,
        bytes.take(4), hist.map(_ / n))
    }

  case class ResizedMedia(media_id: Long, format: String, width: Int,
                          height: Int, pixels: Array[Byte])

  /** STUB resize — nearest-neighbor downsample treating the payload as a
    * 1-D byte signal resampled to width×height. A real implementation
    * swaps the inner loop for the codec's scaler; the batch shape,
    * schema, and determinism contract are the production-shaped parts.
    */
  def resizeStub(records: Dataset[MediaRecord], width: Int,
                 height: Int, batchSize: Int = 64): Dataset[ResizedMedia] = {
    import records.sparkSession.implicits._
    val n = width * height
    records.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val src = r.media
          val out = new Array[Byte](n)
          if (src.nonEmpty) {
            var i = 0
            while (i < n) {
              out(i) = src((i.toLong * src.length / n).toInt)
              i += 1
            }
          }
          ResizedMedia(r.media_id, r.format, width, height, out)
        }
      }
    }
  }

  /** Perceptual near-duplicate clusters over the media payload — the
    * standard image-dedup stage of a multimodal training pipeline,
    * completing the dedup family across modalities (text: minhash /
    * simhash / exact-substring; embeddings: SemDeDup / SRP; media: this).
    *
    * Shape: one codegen-kernel pass computes the 63-bit box-filtered
    * difference hash per payload (`Sketches.dhash63` — on a codec
    * deployment the decoded luma plane feeds the same kernel), then the
    * SAME banded-Hamming machinery as the simhash join generates
    * candidates (9 bands × 7 bits — exact for maxDist ≤ 8 by
    * pigeonhole; no all-pairs product ever forms), and
    * `Dedup.connectedComponents` labels the near-dup groups. Every
    * stage is the simhash path's, so the 100 TB story (bucketed
    * candidates, mega-bucket star guard, stats-gated components) is
    * inherited, not re-derived.
    *
    * Returns `(id, fp, cluster)` — the fingerprint is exported so the
    * oracle verifies the perceptual hash itself, not just the grouping.
    */
  def nearDupClusters(media: DataFrame, idCol: String, mediaCol: String,
                      maxDist: Int = 8, maxBucketSize: Int = 4096): DataFrame = {
    import graft.ops.Dedup
    // the DuckDB oracle recomputes clusters from ALL-PAIRS Hamming, so
    // this caller must stay in banding's EXACT regime (candidates
    // provably complete by pigeonhole) — unlike the recall-oriented
    // simhash text join, which may exceed it
    require(maxDist <= 8,
      s"9x7-bit banding is exact only for Hamming <= 8, got $maxDist")
    val fps = media.select(col(idCol).as("id"),
      graft.functions.Sketches.dhash(col(mediaCol)).as("sh"))
    val pairs = Dedup.bandedHammingPairs(fps, nBands = 9, bandBits = 7,
      maxDist = maxDist, maxBucketSize = maxBucketSize)
    Dedup.connectedComponents(fps, "id", pairs)
      .join(fps.withColumnRenamed("sh", "fp"), Seq("id"))
      .select(col("id"), col("fp"), col("cluster"))
  }

  /** Frame sampling for time-based media: every `stride`-th block of
    * `frameBytes` bytes, as (frame_idx, frame) rows. Pure column algebra
    * — the slice happens where the data lives.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame =
    media
      .withColumn("n_frames",
        floor(col("n_bytes") / frameBytes).cast("int"))
      .withColumn("frame_idx",
        explode(when(col("n_frames") > 0,
          sequence(lit(0), col("n_frames") - 1, lit(stride)))
          .otherwise(array())))
      .withColumn("frame",
        col("media").substr(col("frame_idx") * frameBytes + 1, lit(frameBytes)))
      .select("media_id", "format", "frame_idx", "frame")
}
