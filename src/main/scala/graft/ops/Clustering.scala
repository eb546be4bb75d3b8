package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.MathExprs.{int8Quantize, int8ToLongs, qdistSq}

/** Distributed Lloyd k-means over the int8-quantized embedding column —
  * the FULL-corpus complement to `Ivf.train` (which collects a bounded
  * sample to the driver). Here nothing corpus-sized ever leaves the
  * executors: each iteration is one narrow assignment projection (k
  * codegen'd `qdist_sq` kernels per row, argmin via struct sort — no
  * shuffle) plus one map-side-combined (cluster, dim) integer-sum
  * aggregation whose result is k·dim rows. That is the 100 TB shape:
  * topic clustering / cluster-balanced sampling over a corpus that can
  * never be sampled representatively at 2k rows.
  *
  * Reproducibility is designed in, which is what makes the operator
  * oracle-checkable end to end (`embedding_kmeans`):
  *  - vectors are quantized with `Int8QuantizeExpr` — deterministic
  *    integer coordinates;
  *  - per-cluster accumulation is EXACT (BIGINT sums), so the shuffle's
  *    reduction order cannot perturb centroids — the classic
  *    nondeterminism of float-sum distributed k-means is gone by
  *    construction;
  *  - centroid components are single divisions of exact integers;
  *  - assignment distances are left-fold doubles over deterministic
  *    inputs (`QDistSqExpr` mirrors DuckDB's `list_reduce` order), ties
  *    broken by cluster index;
  *  - init is the k lowest-id vectors (no RNG);
  *  - an empty cluster keeps its previous centroid.
  *
  * The quantized (vec_id, q) projection is PERSISTED through the loop
  * (MEMORY_AND_DISK — it IS the stored form, 1 byte/dim, so even a 100
  * TB float corpus's projection is cluster-cacheable): one corpus scan
  * fills the cache, every Lloyd update reads it, and the projection
  * unpersists when the loop ends. Without this the loop re-scanned and
  * re-quantized the corpus once per update — `updates`+1 full-corpus
  * reads where one suffices. Persistence cannot perturb results
  * (identical deterministic bytes either way); ClusteringSpec pins the
  * plan shape (parquet scans don't grow with `updates`).
  */
object Clustering {

  /** Run `f` with `q` persisted (MEMORY_AND_DISK), unpersisting after —
    * unless the caller already persisted it (composed pipelines like
    * PqIndex.build share ONE cached projection across coarse training,
    * codebook training, and the coded write; the outermost scope owns
    * the cache lifetime).
    */
  private[graft] def withPersistedQ[T](q: DataFrame)(f: DataFrame => T): T = {
    val fresh = q.storageLevel == org.apache.spark.storage.StorageLevel.NONE
    if (fresh) q.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try f(q)
    finally if (fresh) q.unpersist(blocking = false)
  }

  /** Final per-vector assignment after `updates` Lloyd refinements:
    * (vec_id, cluster, qdist) where qdist is the squared quantized
    * distance to the final centroid. Driver state is k×dim doubles —
    * independent of corpus size.
    */
  def kmeansSq8(corpus: DataFrame, idCol: String, vecCol: String,
                k: Int, updates: Int): DataFrame = {
    val q = corpus.select(col(idCol).cast("long").as("vec_id"),
      int8Quantize(col(vecCol)).as("q"))
    val centroids = lloyd(q, k, updates)
    assign(q, centroids).select("vec_id", "cluster", "qdist")
  }

  /** The Lloyd core over an already-quantized (vec_id, q BINARY) frame —
    * shared by whole-vector k-means above and per-subspace PQ codebook
    * training (`Pq.train`). Returns the refined centroids; see the
    * object scaladoc for the determinism contract.
    */
  private[graft] def lloyd(q: DataFrame, k: Int,
                           updates: Int): Array[Array[Double]] = withPersistedQ(q) { q =>
    val init: Array[Array[Double]] = q.orderBy("vec_id").limit(k).collect()
      .map(_.getAs[Array[Byte]]("q").map(_.toDouble))
    require(init.length == k, s"corpus has fewer than $k vectors")
    var centroids = init
    for (_ <- 1 to updates) {
      val sums = assign(q, centroids)
        .select(col("cluster"), posexplode(int8ToLongs(col("q"))).as(Seq("pos", "qi")))
        .groupBy("cluster", "pos")
        .agg(sum(col("qi")).as("s"), count(lit(1)).as("n"))
        .collect() // k·dim rows — bounded by model size, not corpus size
      val next = centroids.map(_.clone()) // empty cluster → previous centroid
      sums.foreach { r =>
        next(r.getInt(0))(r.getInt(1)) = r.getLong(2).toDouble / r.getLong(3)
      }
      centroids = next
    }
    centroids
  }

  /** Nearest-centroid assignment as a pure projection: per row, an array
    * of (dist, cluster) structs sorted by (dist asc, cluster asc) — the
    * same total order as the oracle's `row_number() OVER (ORDER BY dist,
    * cluster)`. No shuffle; the k distance kernels inline into one
    * whole-stage-codegen pass.
    */
  private[graft] def assign(q: DataFrame, centroids: Array[Array[Double]]): DataFrame = {
    val scored = centroids.zipWithIndex.map { case (c, j) =>
      struct(qdistSq(col("q"), typedlit(c.toSeq)).as("dist"),
        lit(j).as("cluster"))
    }
    val top = element_at(array_sort(array(scored: _*), (a, b) =>
      when(a.getField("dist") < b.getField("dist"), -1)
        .when(a.getField("dist") > b.getField("dist"), 1)
        .otherwise(when(a.getField("cluster") < b.getField("cluster"), -1)
          .otherwise(1))), 1)
    q.withColumn("cluster", top.getField("cluster"))
      .withColumn("qdist", top.getField("dist"))
  }
}
