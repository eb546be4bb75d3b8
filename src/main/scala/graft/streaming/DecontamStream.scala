package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{MathExprs, Sketches}

/** Streaming decontamination — the online front-end of the batch
  * `decontamination_bloom` query: the eval suite's Bloom filter is
  * built ONCE batch-side (its bit positions are a bounded static set),
  * and arriving training documents are flagged micro-batch by
  * micro-batch with the same k portable-hash probes.
  *
  * The transform is STATELESS (per-doc projection + a broadcast join
  * against the fixed bit set + a per-doc aggregation inside the batch's
  * own rows), so it needs no watermark, no keyed state, and restarts
  * trivially — the filter travels as a broadcast, the property that
  * makes decontamination deployable on the ingest path rather than as
  * a nightly batch. Uses the exact kernels and coefficients of the
  * batch query; StreamingSpec pins batch ≡ stream on the same corpus.
  *
  * The bit set is passed as a PLAIN LOCAL Seq — at m=16n bits it is
  * bounded by the eval-suite size, not the stream; callers derive it
  * with [[evalPositions]] over the (static, batch) eval documents.
  */
object DecontamStream {

  val K = 3

  private def posCols(m: Long): Seq[Column] = {
    val (pa, pb) = Sketches.permCoeffs(K)
    (0 until K).map(j =>
      ((lit(pa(j)) * col("h") + lit(pb(j))) % Sketches.P1) % m)
  }

  /** Distinct Bloom bit positions of the eval corpus' 5-gram set, plus
    * the modulus m the positions were taken under (16× the distinct
    * gram count — the batch query's sizing). Batch-side: runs two
    * bounded jobs over the EVAL table only.
    */
  def evalPositions(evalDocs: DataFrame, textCol: String): (Seq[Long], Long) = {
    val eg = evalDocs
      .select(explode(Sketches.word_ngrams(col(textCol), 5)).as("gram"))
      .distinct()
    val m = 16L * math.max(eg.count(), 1L)
    val pos = eg
      .withColumn("h", MathExprs.polyHash(col("gram"), Sketches.P1))
      .select(explode(array(posCols(m): _*)).as("pos"))
      .distinct().orderBy("pos")
    (pos.collect().map(_.getLong(0)).toSeq, m)
  }

  /** Flag a batch frame of (doc_id, text) documents: per doc, total
    * 5-grams and how many probe as eval-set members. The streaming
    * front-end applies this inside `foreachBatch` ([[run]]) — each doc
    * arrives whole in one micro-batch, so the per-doc rollup never
    * crosses batches and needs no streaming-aggregation state.
    */
  def flagged(docs: DataFrame, positions: Seq[Long], m: Long): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ebits = positions.toDF("pos")
    val grams = docs.select(col("doc_id"),
        explode(array_distinct(Sketches.word_ngrams(col("text"), 5))).as("gram"))
      .withColumn("h", MathExprs.polyHash(col("gram"), Sketches.P1))
    val probed = posCols(m).zipWithIndex.foldLeft(grams) {
      case (df, (p, j)) => df
        .withColumn(s"p$j", p)
        .join(broadcast(ebits
          .withColumnRenamed("pos", s"p$j").withColumn(s"hit$j", lit(1))),
          Seq(s"p$j"), "left")
    }
    val allHit = (0 until K).map(j => col(s"hit$j").isNotNull).reduce(_ && _)
    probed
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        count(when(allHit, 1)).as("n_flagged"))
      .withColumn("contaminated", col("n_flagged") > 0)
  }

  /** The streaming front-end: flag each arriving micro-batch against
    * the fixed eval filter and append results to `outPath` parquet.
    * foreachBatch + per-batch overwrite under `batch=<id>` makes
    * replays idempotent (the IndexedDedupStream discipline); the
    * filter itself is immutable, so restarts need no state recovery.
    */
  def run(docs: DataFrame, positions: Seq[Long], m: Long,
          outPath: String, checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        flagged(batch.toDF(), positions, m)
          .withColumn("batch", lit(id))
          .write.mode("overwrite")
          .parquet(s"$outPath/batch=$id")
        ()
      }
      .start()
}
