package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys — the manual fallbacks for when AQE's
  * runtime skew-join splitting isn't available (non-shuffle-join plans,
  * pre-3.x clusters) or when a key's skew is known ahead of time.
  *
  * At 100 TB a single hot key (one company domain, one 'unknown' bucket)
  * can hold a full shuffle hostage behind one straggler task; both
  * helpers here trade one extra narrow pass for bounded task sizes.
  */
object Skew {

  /** Two-phase salted aggregation: group by (key, salt) first — spreading
    * a hot key over `saltBuckets` tasks — then re-aggregate by key.
    * `merges` must be the algebraic merge of `partials` (sum/sum,
    * count→sum, min/min, …). For plain count/sum Spark's map-side partial
    * aggregation already does this; use the salted form when the
    * first-level cardinality explosion (e.g. collect_set) defeats partial
    * aggregation.
    */
  def saltedAgg(df: DataFrame, key: Column, saltBuckets: Int,
                partials: Seq[Column], merges: Seq[Column]): DataFrame =
    df.withColumn("_salt",
        pmod(monotonically_increasing_id(), lit(saltBuckets.toLong)).cast("int"))
      .groupBy(key.as("_key"), col("_salt"))
      .agg(partials.head, partials.tail: _*)
      .groupBy(col("_key"))
      .agg(merges.head, merges.tail: _*)

  /** Salted broadcast-free join for a skewed fact side: replicate each
    * dim row `saltBuckets`× with an explicit salt, salt the fact side by
    * a deterministic row hash, join on (key, salt). Every fact row joins
    * exactly one replica, so a hot key's rows spread over `saltBuckets`
    * shuffle partitions instead of one.
    *
    * Prefer `broadcast(dim)` when the dim fits in memory — salting is for
    * mid-size dims (too big to broadcast, small enough to replicate).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
                 dimKey: String, saltBuckets: Int,
                 factHashCols: Seq[Column]): DataFrame = {
    val saltedFact = fact.withColumn("_salt",
      pmod(xxhash64(factHashCols: _*), lit(saltBuckets.toLong)).cast("int"))
    val saltedDim = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedFact.join(saltedDim,
        saltedFact(factKey) === saltedDim(dimKey) &&
          saltedFact("_salt") === saltedDim("_salt"))
      .drop("_salt")
  }
}
