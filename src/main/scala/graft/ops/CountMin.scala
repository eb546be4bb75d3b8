package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch over a token stream — the mergeable frequency
  * sketch for heavy-hitter queries at corpus scale.
  *
  * Scale shape (the reason a sketch exists at all): `buildSketch`
  * explodes each occurrence into `d` (row, bucket) cells and lets
  * partial (map-side) aggregation collapse every task's contribution to
  * at most d×w cells BEFORE the shuffle — the shuffle moves a
  * fixed-size sketch per task regardless of corpus size, and sketch
  * merge is cell-wise sum (associative/commutative), so a 100 TB build
  * is one scan plus a constant-size exchange. No exact
  * distinct-token shuffle happens anywhere in the sketch path; exact
  * counts appear only in verification queries that gate the estimate.
  *
  * Hashing is the portable polynomial fold over `"<row>#<token>"`
  * (row-salted), so any engine — the DuckDB oracle included — rebuilds
  * the identical sketch cell-for-cell.
  */
object CountMin {
  val HashMod: Long = 1000000007L

  /** Bucket of `tok` in sketch row `j` (deterministic, engine-portable). */
  def bucket(tok: Column, j: Int, width: Int): Column =
    graft.functions.MathExprs.polyHash(
      concat(lit(s"$j#"), tok), HashMod) % width

  /** d×w sketch cells `(j, bucket, n)` from a one-column frame of token
    * occurrences. Cells with zero count are absent (semantically 0).
    */
  def buildSketch(tokens: DataFrame, tokCol: String,
                  d: Int = 4, width: Int = 512): DataFrame = {
    val t = col(tokCol)
    tokens
      .select(explode(array((0 until d).map(j =>
        struct(lit(j).as("j"), bucket(t, j, width).as("bucket"))): _*)).as("jb"))
      .groupBy(col("jb.j").as("j"), col("jb.bucket").as("bucket"))
      .agg(count(lit(1)).as("n"))
  }

  /** Point estimates for the tokens of `queries(tokCol)`: the CMS
    * estimate is min over rows of the addressed cell. The sketch side is
    * at most d×w rows, so Spark broadcasts it and the query side never
    * shuffles.
    */
  def estimate(sketch: DataFrame, queries: DataFrame, tokCol: String,
               d: Int = 4, width: Int = 512): DataFrame = {
    val q = queries
      .select(col("*"), explode(array((0 until d).map(j =>
        struct(lit(j).as("j"),
          bucket(col(tokCol), j, width).as("bucket"))): _*)).as("jb"))
      .select(col("*"), col("jb.j").as("j"), col("jb.bucket").as("bucket"))
      .drop("jb")
    q.join(broadcast(sketch), Seq("j", "bucket"))
      .groupBy(queries.columns.map(col): _*)
      .agg(min(col("n")).as("est_n"))
  }
}
