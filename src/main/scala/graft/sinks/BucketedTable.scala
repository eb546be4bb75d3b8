package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hash-bucketed keyed table with copy-on-write maintenance — the
  * scale-correct upgrade of the snapshot-rewrite S7/S8 sinks: the table
  * lives as `path/bucket=<i>/…` with `bucket = hash(key) mod nBuckets`,
  * and an update/delete/upsert REWRITES ONLY THE BUCKETS CONTAINING
  * TOUCHED KEYS (dynamic partition overwrite). A 1 000-key update
  * against a 10⁹-row table costs ≤ 1 000 bucket rewrites of
  * tableSize/nBuckets each — IO proportional to the touched slice, not
  * the table; untouched bucket directories are never read or written.
  * Point lookups prune to one directory at plan time (PartitionFilters
  * on the bucket column).
  *
  * This is the same copy-on-write contract a Delta/Iceberg MERGE
  * provides; what the ACID formats add on top — and what plain parquet
  * cannot — is an atomic multi-partition commit and snapshot isolation
  * for concurrent readers. Single-writer pipelines (this warehouse's
  * shape) get the full IO-scaling benefit from the layout alone.
  *
  * Durability: rewrites are STAGED — the merged buckets land in a
  * sibling staging directory (so the job reads the live table and
  * writes elsewhere; no read-overwrite cycle, no executor-memory pin),
  * and only after the write succeeds are the touched bucket
  * directories swapped in. A failed job leaves the table exactly as it
  * was; a crash mid-swap leaves each bucket at either the old or the
  * new version with nothing lost (re-run the merge to converge) — the
  * earlier localCheckpoint+dynamic-overwrite path could permanently
  * lose touched buckets on executor failure, since the only copy of
  * the merged slice lived in executor storage while the source files
  * were being deleted. For the multi-bucket swap as ONE atomic commit
  * (plus snapshot isolation, time travel, O(batch) append and keyed
  * CDC) see [[ManifestTable]] — the manifest-committed sibling of this
  * layout; this class remains the zero-metadata variant whose
  * directories any plain parquet reader can scan directly.
  */
object BucketedTable {

  private def bucketCol(keyCol: String, nBuckets: Int) =
    pmod(xxhash64(col(keyCol)), lit(nBuckets.toLong)).cast("int").as("bucket")

  /** Initial (or full) write of the bucketed layout. */
  def write(df: DataFrame, path: String, keyCol: String, nBuckets: Int): Unit =
    df.withColumn("bucket", bucketCol(keyCol, nBuckets))
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(path)

  /** Read the table (bucket column retained — filters on it prune). */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Keyed point lookup: the key's bucket is computed driver-side with
    * the same xxhash64(seed 42) Spark's `xxhash64` column function
    * evaluates — AGAINST THE TABLE'S ACTUAL KEY TYPE, read from the
    * parquet schema. A literal typed differently from the column (e.g.
    * a Long probe against an INT key column) hashes differently and
    * would silently return empty, so the mismatch throws instead.
    * The literal bucket predicate prunes the scan to one directory —
    * zero IO against every other bucket.
    */
  def lookup(spark: SparkSession, path: String, keyCol: String,
             keyValue: Any, nBuckets: Int): DataFrame = {
    val df = read(spark, path)
    val dt = df.schema(keyCol).dataType
    val lit0 = org.apache.spark.sql.catalyst.expressions.Literal(keyValue)
    require(lit0.dataType == dt,
      s"lookup key ${lit0.dataType.sql} does not match table column " +
        s"$keyCol: ${dt.sql} — the driver-side bucket hash would diverge " +
        "from the written one and silently miss")
    val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function
      .hash(lit0.value, dt, 42L)
    val b = (((h % nBuckets) + nBuckets) % nBuckets).toInt
    df.filter(col("bucket") === b && col(keyCol) === keyValue)
  }

  /** Write the rewritten slice to a sibling staging dir, then swap the
    * touched bucket directories into the live table. `touched` buckets
    * with no staged output (every row deleted) are removed. The staged
    * copy exists on disk before any source directory is disturbed.
    */
  private def stageAndSwap(spark: SparkSession, path: String,
                           touched: Seq[Int], slice: DataFrame): Unit = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stage = new Path(path + ".staging-" + java.util.UUID.randomUUID())
    try {
      slice.write.mode("overwrite").partitionBy("bucket").parquet(stage.toString)
      val staged =
        if (fs.exists(stage))
          fs.listStatus(stage).map(_.getPath.getName).filter(_.startsWith("bucket=")).toSet
        else Set.empty[String]
      touched.foreach { b =>
        val name = s"bucket=$b"
        val dst = new Path(path, name)
        fs.delete(dst, true)
        if (staged(name)) fs.rename(new Path(stage, name), dst)
      }
    } finally fs.delete(stage, true)
  }

  /** MERGE: rows of `updates` replace same-key rows, new keys insert —
    * rewriting only the buckets `updates` touches.
    */
  def upsert(spark: SparkSession, path: String, updates: DataFrame,
             keyCol: String, nBuckets: Int): Unit = {
    val u = updates.withColumn("bucket", bucketCol(keyCol, nBuckets))
    // ≤ nBuckets values — bounded driver metadata, like a partition listing
    val touched = u.select("bucket").distinct().collect().map(_.getInt(0))
    val existing = read(spark, path).filter(col("bucket").isin(touched.map(Integer.valueOf): _*))
    val merged = existing
      .join(u.select(col(keyCol)), Seq(keyCol), "left_anti")
      .unionByName(u.select(existing.columns.map(col): _*))
    stageAndSwap(spark, path, touched.toSeq, merged)
  }

  /** Keyed update expressed as a merge: read the touched buckets, apply
    * the column updates to matching rows, rewrite those buckets (S7 at
    * scale).
    */
  def update(spark: SparkSession, path: String, keyCol: String, keyValue: Any,
             updates: Map[String, org.apache.spark.sql.Column],
             nBuckets: Int): Unit = {
    val matching = read(spark, path).filter(col(keyCol) === keyValue)
    val updated = updates.foldLeft(matching) { case (d, (c, v)) => d.withColumn(c, v) }
    upsert(spark, path, updated.drop("bucket"), keyCol, nBuckets)
  }

  /** Keyed delete (S8 at scale): rewrite only the keys' buckets without
    * the matching rows; a bucket whose rows are all deleted produces no
    * staged output and is removed in the swap.
    */
  def delete(spark: SparkSession, path: String, keyCol: String,
             keyValue: Any, nBuckets: Int): Unit = {
    val victims = read(spark, path).filter(col(keyCol) === keyValue)
    val touched = victims.select("bucket").distinct().collect().map(_.getInt(0))
    if (touched.nonEmpty) {
      val remaining = read(spark, path)
        .filter(col("bucket").isin(touched.map(Integer.valueOf): _*))
        // null-safe: a NULL-key row sharing the bucket must survive
        // (plain =!= evaluates to NULL for it and would drop it)
        .filter(!(col(keyCol) <=> keyValue))
      stageAndSwap(spark, path, touched.toSeq, remaining)
    }
  }
}
