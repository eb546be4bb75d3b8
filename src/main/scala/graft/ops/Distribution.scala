package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** The reference's capacity-bounded greedy distribution (D1,
  * send/route.ts:63-81) as pure DataFrame transforms.
  *
  * Semantics (proved equivalent to the reference's loop by the ScalaCheck
  * spec): order companies by an explicit total order, walk webhooks in
  * their own order, give each webhook the next slice of ≤ capacity
  * companies; companies past `numWebhooks × capacity` stay unassigned.
  * Equivalent closed form: `bucket(row) = (rank-1) div capacity`, assigned
  * iff `bucket < numWebhooks`.
  */
object Distribution {

  /** Global 1-based rank via a window. Simple and deterministic, but
    * `Window.orderBy` without partitioning funnels all rows through ONE
    * task — fine to ~10M rows, the known scale-out point of this engine
    * (SURVEY §4.3). Use `rankGlobalScalable` beyond that.
    */
  def rankGlobal(df: DataFrame, orderCols: Seq[Column]): DataFrame =
    df.withColumn("rn",
      row_number().over(Window.orderBy(orderCols: _*)).cast("long"))

  /** Global 1-based rank without the single-partition window: range-
    * partition by the order columns (sampled range boundaries keep
    * partitions balanced), sort within partitions, then assign contiguous
    * index blocks per partition (zipWithIndex). Two extra jobs (range
    * sampling + partition-size count) buy full parallelism — this is the
    * 100 TB path. `orderCols` must be a total order (unique tiebreaker)
    * or ranks at partition boundaries are nondeterministic.
    */
  def rankGlobalScalable(df: DataFrame, orderCols: Seq[Column]): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
    val schema = sorted.schema.add("rn", LongType, nullable = false)
    val rdd = sorted.rdd.zipWithIndex().map { case (row, idx) =>
      Row.fromSeq(row.toSeq :+ (idx + 1L))
    }
    spark.createDataFrame(rdd, schema)
  }

  /** 0-based webhook index in walk order (send/route.ts:71). */
  def indexWebhooks(webhooks: DataFrame, orderCols: Seq[Column]): DataFrame =
    webhooks.withColumn("widx",
      row_number().over(Window.orderBy(orderCols: _*)).cast("long") - 1)

  /** Assign ranked companies (must carry `rn` and a `capacity` column) to
    * indexed webhooks (must carry `widx`). Inner join drops the surplus —
    * exactly the reference's `companiesNotAssigned` behavior. The webhook
    * side is a small dim: keep it broadcast.
    */
  def assign(ranked: DataFrame, webhooksIndexed: DataFrame): DataFrame = {
    val bucketed = ranked.withColumn("bucket", expr("(rn - 1) div capacity"))
    bucketed.join(broadcast(webhooksIndexed),
      bucketed("bucket") === webhooksIndexed("widx"), "inner")
  }

  /** The surplus rows `assign` drops (send/route.ts:170). */
  def unassigned(ranked: DataFrame, numWebhooks: Long): DataFrame =
    ranked.withColumn("bucket", expr("(rn - 1) div capacity"))
      .filter(col("bucket") >= numWebhooks)

  /** Executable spec: the reference's greedy loop verbatim as a fold
    * (send/route.ts:63-81) — used by tests to prove the closed form
    * equivalent. Driver-side; never call on real data.
    */
  def greedyReference[C, W](companies: Seq[C], webhooks: Seq[W],
                            capacity: Int): (Seq[(C, W)], Seq[C]) = {
    val assigned = webhooks.zipWithIndex.flatMap { case (w, i) =>
      companies.slice(i * capacity, (i + 1) * capacity).map(c => (c, w))
    }
    val unassigned = companies.drop(webhooks.size * capacity)
    (assigned, unassigned)
  }
}
