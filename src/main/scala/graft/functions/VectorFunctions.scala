package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ARRAY<FLOAT>` embedding columns, built from Spark's
  * higher-order functions (codegen'd expression trees — no UDF
  * serialization, no Python round trip).
  *
  * All arithmetic is widened to double BEFORE multiply/accumulate, and
  * accumulation is a sequential left fold — the same evaluation order
  * DuckDB's `list_reduce` uses, so oracle comparisons agree bit-for-bit.
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ in double precision (left fold) — codegen'd primitive loop
    * (MathExprs.dotProduct); the HOF formulation below is kept as the
    * executable spec.
    */
  def dot(a: Column, b: Column): Column = MathExprs.dotProduct(a, b)

  /** The HOF spec of `dot` (identical fold order; interpreted, allocates —
    * test-only).
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** ‖a‖₂ in double precision: sqrt of the same left-fold dot. */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** cos(a,b) = a·b / (‖a‖‖b‖); NULL on zero vectors rather than NaN. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val n = l2Norm(a) * l2Norm(b)
    when(n > 0, d / n)
  }

  /** Squared euclidean distance in double precision. */
  def l2DistSq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val diff = x.cast("double") - y.cast("double")
        diff * diff
      }),
      lit(0.0), (acc, v) => acc + v)

  /** Sign-random-projection bucket for LSH over embeddings: `nPlanes`
    * pseudo-random ±1 hyperplanes derived deterministically from
    * (plane, dim) via murmur — no RNG state, reproducible across runs and
    * engines that share the seed scheme. Returns a LONG bucket id whose
    * bit p is the sign of vec·plane_p.
    *
    * At 100 TB this is the scale path for similarity search: bucket is
    * computed in one narrow pass, the subsequent candidate join shuffles
    * only same-bucket rows.
    */
  def srpBucket(vec: Column, dim: Int, nPlanes: Int): Column = {
    require(nPlanes <= 62, "bucket packs into a long")
    val planes = srpPlanes(dim, nPlanes)
    (0 until nPlanes).map { p =>
      val d = dot(vec, typedlit(planes(p).toSeq))
      when(d >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** The same ±1 planes as driver-side vectors (for tests / candidate
    * verification). Float so the literal matches the embedding column's
    * ARRAY<FLOAT> element type (±1 is exact in either width).
    */
  def srpPlanes(dim: Int, nPlanes: Int): Array[Array[Float]] =
    Array.tabulate(nPlanes, dim) { (p, d) =>
      if (scala.util.hashing.MurmurHash3.productHash((p, d)) % 2 == 0) 1.0f else -1.0f
    }
}
