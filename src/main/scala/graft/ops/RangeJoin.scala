package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tolerance (band) join: pairs of rows on the same key whose times lie
  * within ±tolerance — the interval/range join Spark has no native
  * operator for.
  *
  * A naive theta join (`abs(tl - tr) <= tol`) degenerates to a per-key
  * cross product (broadcast-nested-loop at best). The bucketed form maps
  * each time to a tolerance-sized bucket, replicates ONE side into its
  * two neighbor buckets, equi-joins on (key, bucket), and exact-filters —
  * candidates shrink from |key-group|² to rows-per-±2-buckets, and the
  * join is a plain shuffled hash join that scales like any equi-join.
  */
object RangeJoin {

  /** Pairs (l, r) with same `key`, `abs(lTime - rTime) <= tolMicros`,
    * and `lId < rId` (unordered distinct pairs; set lId/rId to the same
    * column for self-joins). Times are long microseconds.
    */
  def withinTolerance(left: DataFrame, right: DataFrame, key: String,
                      lTimeMicros: String, rTimeMicros: String,
                      lId: String, rId: String,
                      tolMicros: Long): DataFrame = {
    val l = left.select(col(key).as("_k"), col(lTimeMicros).as("_lt"),
      col(lId).as("id_l"))
      .withColumn("_bucket", floor(col("_lt") / tolMicros))
    // replicate the right side into its bucket and both neighbors: any
    // pair within tol differs by at most one bucket
    val r = right.select(col(key).as("_rk"), col(rTimeMicros).as("_rt"),
      col(rId).as("id_r"))
      .withColumn("_rbucket", floor(col("_rt") / tolMicros))
      .withColumn("_bucket", explode(array(
        col("_rbucket") - 1, col("_rbucket"), col("_rbucket") + 1)))
    l.join(r, l("_k") === r("_rk") && l("_bucket") === r("_bucket"))
      .filter(abs(col("_lt") - col("_rt")) <= tolMicros &&
        col("id_l") < col("id_r"))
      .select(col("_k").as(key), col("id_l"), col("id_r"),
        (col("_rt") - col("_lt")).as("delta_micros"))
  }
}
