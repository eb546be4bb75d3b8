package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, DoubleType, LongType, StringType, StructField, StructType}

/** Exact quantiles at scale.
  *
  * Spark's `percentile()` (like DuckDB's `quantile_cont`) buffers EVERY
  * value of a group inside one aggregation buffer — O(group size) memory
  * in a single task, which is exactly the operator shape that dies first
  * on a 100 TB fact table with a handful of groups. This module computes
  * the same type-7 (linear interpolation) quantiles by distributed sort +
  * rank selection instead:
  *
  *   1. range-partition on (group, value) and sort within partitions —
  *      every partition holds a contiguous slice of some group's sorted
  *      values, sized by data volume, not by group count;
  *   2. count rows per (partition, group) — bounded metadata
  *      (≤ partitions × groups rows) collected to the driver and turned
  *      into per-partition starting offsets per group;
  *   3. a second pass assigns each row its within-group rank from the
  *      broadcast offsets (the sort is deterministic, so both passes see
  *      identical partition contents);
  *   4. for each requested q, keep only the two rows straddling
  *      h = q·(n-1) and interpolate with the WEIGHTED form
  *      v = (hi - h)·v_lo + (h - lo)·v_hi — the exact expression
  *      Spark's `Percentile` evaluates, so results agree to the last
  *      bit (the algebraically-equal v_lo + frac·Δ form rounds
  *      differently in the final ulp).
  *
  * The arithmetic is bit-identical to `percentile`/`quantile_cont`
  * (same h, same interpolation, all in doubles), so oracle queries keep
  * hash-matching — QuantilesSpec asserts exact equality against the
  * buffering built-in on the fixtures.
  */
object Quantiles {

  /** Sorted values of `valueCol` with a dense 1-based within-group rank
    * (`g`, `v`, `rn`) — no per-group buffering anywhere; NULL values are
    * dropped (the `percentile` convention — note a group whose values are
    * ALL null therefore disappears entirely, where `percentile()` would
    * emit it with a NULL quantile; callers that need such groups must
    * left-join the result back to the distinct keys).
    *
    * The range-shuffled sort is PERSISTED before the two passes: pass 1
    * (counts) and pass 2 (rank assignment) read the same materialized
    * partitions, so the dominant sort cost is paid once and the
    * partition-content agreement between passes is guaranteed by the
    * cache rather than by re-execution determinism. The driver-side
    * offset map is bounded by partitions × groups — fine for the
    * low-cardinality group keys quantiles are computed over; a
    * high-cardinality key would make `exactQuantiles`' broadcast of
    * per-group counts the wrong tool anyway.
    *
    * EXECUTABLE-SPEC ONLY (`private[graft]`): the returned DataFrame
    * lazily reads the cached sort, so the cache cannot be released until
    * the plan is dereferenced (ContextCleaner). Production queries use
    * `exactQuantiles`, which lands its tiny selection pass driver-side
    * and unpersists the sort eagerly; QuantilesSpec keeps this full-rank
    * variant as the reference model the selection pass is checked
    * against.
    */
  private[graft] def groupRanked(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val spark = df.sparkSession
    val s = df.filter(col(valueCol).isNotNull)
      .select(col(groupCol).cast("string").as("g"),
        col(valueCol).cast("double").as("v"))
      .repartitionByRange(col("g"), col("v"))
      .sortWithinPartitions(col("g"), col("v"))
    // one sort, two readers: persist the sorted RDD (spillable), then run
    // the counts pass and the rank pass against the cached partitions.
    // The cache is released by Spark's ContextCleaner once the plan built
    // on it is dereferenced.
    val sorted = s.rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // pass 1: per-(partition, group) counts — bounded metadata, the same
    // kind of small driver job rankGlobalScalable's range sampling runs
    val counts = sorted.mapPartitionsWithIndex { (pid, it) =>
      val m = scala.collection.mutable.LinkedHashMap[String, Long]()
      it.foreach { r => val g = r.getString(0); m(g) = m.getOrElse(g, 0L) + 1L }
      m.iterator.map { case (g, c) => (pid, g, c) }
    }.collect()
    val offsets: Map[(Int, String), Long] = counts.groupBy(_._2).flatMap {
      case (g, arr) =>
        var acc = 0L
        arr.sortBy(_._1).map { case (pid, _, c) =>
          val o = acc; acc += c; ((pid, g), o)
        }
    }
    val bc = spark.sparkContext.broadcast(offsets)
    val schema = StructType(Seq(StructField("g", StringType),
      StructField("v", DoubleType), StructField("rn", LongType)))
    // pass 2: the cached partitions, ranks = broadcast offset + local idx.
    // Every (pid, g) here was observed by pass 1 on the same cached data;
    // a miss means the cache invariant broke — fail loudly, never misrank.
    val rdd = sorted.mapPartitionsWithIndex { (pid, it) =>
      val local = scala.collection.mutable.HashMap[String, Long]()
      it.map { r =>
        val g = r.getString(0)
        val i = local.getOrElse(g, 0L)
        local(g) = i + 1L
        val off = bc.value.getOrElse((pid, g),
          sys.error(s"quantile rank pass saw unknown (partition=$pid, group=$g): " +
            "sorted input changed between the counts and rank passes"))
        Row(g, r.getDouble(1), off + i + 1L)
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Exact type-7 quantiles per group: one output row per
    * (group, quantile name). `qs` maps output names to fractions.
    *
    * Uses the same sorted-once prelude as `groupRanked`, but the second
    * pass emits ONLY the rows straddling each requested quantile: the
    * driver already knows n per group from the counts metadata, so the
    * target ranks lo+1 / hi+1 are computed up front and broadcast —
    * every other row is dropped inside the scan of the cached sort. That
    * replaces the full-rank materialization → broadcast-join(n) →
    * crossJoin(spec) → filter chain (five stages over the whole input)
    * with one cheap filtered pass emitting groups × quantiles × 2 rows.
    */
  def exactQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                     qs: Seq[(String, Double)]): DataFrame = {
    val spark = df.sparkSession
    val s = df.filter(col(valueCol).isNotNull)
      .select(col(groupCol).cast("string").as("g"),
        col(valueCol).cast("double").as("v"))
      .repartitionByRange(col("g"), col("v"))
      .sortWithinPartitions(col("g"), col("v"))
    val sorted = s.rdd.setName("graft-quantiles-sorted")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = sorted.mapPartitionsWithIndex { (pid, it) =>
      val m = scala.collection.mutable.LinkedHashMap[String, Long]()
      it.foreach { r => val g = r.getString(0); m(g) = m.getOrElse(g, 0L) + 1L }
      m.iterator.map { case (g, c) => (pid, g, c) }
    }.collect()
    val offsets: Map[(Int, String), Long] = counts.groupBy(_._2).flatMap {
      case (g, arr) =>
        var acc = 0L
        arr.sortBy(_._1).map { case (pid, _, c) =>
          val o = acc; acc += c; ((pid, g), o)
        }
    }
    val nByG: Map[String, Long] =
      counts.groupBy(_._2).map { case (g, arr) => g -> arr.map(_._3).sum }
    // (group, rank) → the quantile rows that need this rank's value;
    // h = q·(n-1) in the exact double arithmetic the Column form used
    val needed: Map[(String, Long), Seq[(String, Double, Long, Boolean)]] =
      nByG.toSeq.flatMap { case (g, n) =>
        qs.flatMap { case (qname, q) =>
          val h = q * (n - 1).toDouble
          val lo = math.floor(h).toLong
          val hi = math.ceil(h).toLong
          Seq(((g, lo + 1), (qname, h, lo, true)),
            ((g, hi + 1), (qname, h, lo, false)))
        }
      }.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val bcOff = spark.sparkContext.broadcast(offsets)
    val bcNeeded = spark.sparkContext.broadcast(needed)
    val schema = StructType(Seq(StructField("g", StringType),
      StructField("qname", StringType), StructField("h", DoubleType),
      StructField("lo", LongType), StructField("is_lo", BooleanType),
      StructField("v", DoubleType)))
    // the selection pass emits only groups × quantiles × 2 rows — small
    // enough to land driver-side, which lets the sorted cache be released
    // HERE instead of leaking until the ContextCleaner notices (repeated
    // quantile queries in a long-lived session would otherwise accumulate
    // MEMORY_AND_DISK partitions)
    val hits = sorted.mapPartitionsWithIndex { (pid, it) =>
      val local = scala.collection.mutable.HashMap[String, Long]()
      it.flatMap { r =>
        val g = r.getString(0)
        val i = local.getOrElse(g, 0L)
        local(g) = i + 1L
        val off = bcOff.value.getOrElse((pid, g),
          sys.error(s"quantile pass saw unknown (partition=$pid, group=$g): " +
            "sorted input changed between the counts and selection passes"))
        bcNeeded.value.getOrElse((g, off + i + 1L), Nil).map {
          case (qname, h, lo, isLo) => Row(g, qname, h, lo, isLo, r.getDouble(1))
        }
      }
    }.collect().toIndexedSeq
    sorted.unpersist(blocking = false)
    // identical interpolation arithmetic to Spark's Percentile: the
    // weighted (hi-h)·v_lo + (h-lo)·v_hi form, h/lo unchanged
    spark.createDataFrame(spark.sparkContext.parallelize(hits, 1), schema)
      .groupBy("g", "qname")
      .agg(
        min(when(col("is_lo"), col("v"))).as("vlo"),
        min(when(!col("is_lo"), col("v"))).as("vhi"),
        first("h").as("h"), first("lo").as("lo"))
      .withColumn("value",
        when(col("lo") === ceil(col("h")).cast("long"), col("vlo"))
          .otherwise((ceil(col("h")) - col("h")) * col("vlo")
            + (col("h") - col("lo")) * col("vhi")))
      .select(col("g").as(groupCol), col("qname"), col("value"))
  }
}
