package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for each left row, the most recent right row
  * with `rightTime <= leftTime` on the same key (the temporal lookup
  * Spark's join operators lack; SURVEY §2.3 notes the reference has no
  * such operator, but any warehouse with event + slowly-changing data
  * needs it).
  *
  * Built by composition (preference (a) over a custom SparkPlan): tag and
  * UNION both sides, one window pass per key carrying the last non-null
  * right values forward, keep left rows. Cost: one shuffle on the key and
  * one sort — same as a sort-merge join, but with NO range-condition row
  * explosion (a naive `t_r <= t_l` theta join is quadratic per key).
  *
  * Determinism: right rows must be unique per (key, time) or carry a
  * total order — the window sorts by (time, side, tiebreakers) so the
  * last right row under that order wins, reproducibly.
  */
object AsOf {

  /** @param left       left rows (events)
    * @param right      right rows (state changes), unique per (key, time)
    *                   or disambiguated by `rightTiebreak`
    * @param key        join key column name (same on both sides' output)
    * @param leftTime   left event-time column (on `left`)
    * @param rightTime  right event-time column (on `right`)
    * @param rightVals  value columns of `right` to carry onto left rows
    *                   (must be non-null in right rows, and must not
    *                   collide with left column names)
    * @param rightTiebreak ordering column among simultaneous right rows
    *                   (highest wins); needed whenever (key, rightTime)
    *                   is not unique
    */
  def joinBackward(left: DataFrame, right: DataFrame, key: String,
                   leftTime: String, rightTime: String,
                   rightVals: Seq[String],
                   rightTiebreak: Option[String] = None): DataFrame = {
    val leftCols = left.columns
    val sentinel = lit(null).cast("long")
    val l = left
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1))
      .withColumn("_tb", sentinel)
    val lAligned = rightVals.foldLeft(l)((d, v) =>
      d.withColumn(s"_r_$v", lit(null).cast(right.schema(v).dataType)))
    val r0 = right
      .withColumnRenamed(key, "_rkey")
      .withColumn("_t", col(rightTime))
      .withColumn("_side", lit(0))
      .withColumn("_tb",
        rightTiebreak.map(col(_).cast("long")).getOrElse(sentinel))
    val rAligned = leftCols.foldLeft(
      rightVals.foldLeft(r0)((d, v) => d.withColumn(s"_r_$v", col(v)))
    ) { (d, c) =>
      if (c == key) d.withColumn(key, col("_rkey"))
      else d.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val cols = (leftCols.toSeq ++ Seq("_t", "_side", "_tb") ++
      rightVals.map(v => s"_r_$v")).map(col)
    val unioned = lAligned.select(cols: _*)
      .unionByName(rAligned.select(cols: _*))
    // right rows sort BEFORE left rows at equal time → '<=' semantics;
    // among simultaneous right rows the last under _tb wins
    val w = Window.partitionBy(key).orderBy(col("_t"), col("_side"), col("_tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightVals.foldLeft(unioned)((d, v) =>
      d.withColumn(s"_asof_$v", last(col(s"_r_$v"), ignoreNulls = true).over(w)))
    carried.filter(col("_side") === 1)
      .select(leftCols.map(col) ++
        rightVals.map(v => col(s"_asof_$v").as(s"asof_$v")): _*)
  }
}
