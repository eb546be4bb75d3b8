package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Streaming token-budget packing — the online counterpart of the batch
  * `token_budget_pack` shape: documents arrive as a stream and each is
  * assigned to a training pack per source, a new pack opening whenever
  * the current one cannot fit the next document (first-fit greedy in
  * arrival order, ascending doc_id within a micro-batch so results are
  * arrival-order-independent per batch).
  *
  * Keyed state per source is TWO LONGS (open pack id + tokens used) —
  * constant per key regardless of stream length, the state shape that
  * survives unbounded streams. Token counting runs in the stream's
  * narrow projection (same `TextAnalysis.tokenCount` kernel as the
  * batch query).
  *
  * An over-budget document still gets its own (immediately full) pack —
  * packs are never split, matching how sequence packing feeds fixed
  * context windows.
  */
object PackStream {

  case class DocTokens(source: String, doc_id: Long, n_tokens: Long)
  case class PackState(packId: Long, used: Long)
  case class Packed(source: String, doc_id: Long, n_tokens: Long, pack_id: Long)

  /** The per-source packer — also the batch executable spec (the spec
    * runs it over a plain sorted iterator and compares).
    */
  private[graft] def packDocs(budget: Long)(
      source: String, docs: Iterator[DocTokens],
      state: GroupState[PackState]): Iterator[Packed] = {
    var st = state.getOption.getOrElse(PackState(0L, 0L))
    val out = docs.toSeq.sortBy(_.doc_id).map { d =>
      if (st.used > 0 && st.used + d.n_tokens > budget)
        st = PackState(st.packId + 1, 0L)
      st = PackState(st.packId, st.used + d.n_tokens)
      Packed(source, d.doc_id, d.n_tokens, st.packId)
    }
    state.update(st)
    out.iterator
  }

  /** The packing transform on any streaming (source, doc_id, text) frame. */
  def packed(docs: DataFrame, budget: Long): Dataset[Packed] = {
    import docs.sparkSession.implicits._
    docs.select(col("source"), col("doc_id"),
        graft.ops.TextAnalysis.tokenCount(col("text")).as("n_tokens"))
      .as[DocTokens]
      .groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        packDocs(budget))
  }

  /** Start the stream: `source<TAB>doc_id<TAB>text` lines land under
    * `landingDir`; pack assignments append to `outPath`. Pack state
    * survives restarts through the checkpoint, so packs keep filling
    * across runs.
    */
  def start(spark: SparkSession, landingDir: String, outPath: String,
            checkpoint: String, budget: Long): StreamingQuery = {
    val docs = spark.readStream
      .schema("value STRING")
      .text(landingDir)
      .select(
        split(col("value"), "\t").getItem(0).as("source"),
        split(col("value"), "\t").getItem(1).cast("long").as("doc_id"),
        split(col("value"), "\t").getItem(2).as("text"))
    packed(docs, budget).writeStream
      .trigger(Trigger.AvailableNow())
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .format("parquet")
      .option("path", outPath)
      .start()
  }
}
