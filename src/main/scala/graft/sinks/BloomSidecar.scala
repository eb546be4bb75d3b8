package graft.sinks

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Per-directory Bloom-filter SIDECARS for manifest tables — dir-level
  * skipping for the predicate class zone maps cannot serve: EQUALITY on
  * a high-cardinality column (a UUID id, a content hash), whose values
  * are uniformly distributed so every directory's [min,max] spans the
  * whole domain and range bounds prune nothing. This is the reference's
  * hottest point-lookup shape — keyed UUID fetches
  * (`/root/reference/src/app/api/webhooks/route.ts:61,85`) — served the
  * way Iceberg serves it with Puffin blob sidecars and parquet serves it
  * with split-block bloom filters, lifted to the DIRECTORY level so a
  * probe skips dirs before any file (or footer) is opened.
  *
  * Layout: `<dataDir>/_bloom-<col>.bin` — the underscore prefix makes
  * the file invisible to every Spark/parquet listing (hidden-file
  * convention), so data readers are unaffected. Sidecars are written
  * CREATE-ONLY into immutable data directories: a dir's parquet files
  * are never modified, losers of a create race skip, and a missing or
  * unreadable sidecar simply means "cannot prune" — pruning is advisory,
  * correctness never depends on a sidecar existing.
  *
  * Immutability is also what makes the DRIVER CACHE sound: a (dir, col)
  * entry can never be invalidated because the dir's contents never
  * change after commit; vacuum deletes whole dirs, whose cache entries
  * then just go unused. Point-lookup-heavy workloads amortize the
  * sidecar read to zero.
  *
  * Sizing: ~0.9 bytes/row at the 3% false-positive target. A dir above
  * [[MaxRowsPerDir]] rows gets NO sidecar (the filter would be tens of
  * MB and a dir that large is served by bucket pruning + OPTIMIZE
  * splitting); fpp only costs a wasted dir read on a miss, never a
  * wrong result.
  */
private[graft] object BloomSidecar {

  /** False-positive probability target per sidecar. */
  val Fpp = 0.03

  /** Dirs with more rows than this get no sidecar (bounded sidecar
    * bytes: 8M rows ≈ 7.3 MB at 3% fpp is the ceiling).
    */
  val MaxRowsPerDir: Long = 8L << 20

  def fileName(colName: String) = s"_bloom-$colName.bin"

  /** Column types a sidecar supports: string and integral — the id/hash
    * shapes point lookups probe. Floats are excluded (NaN/±0.0 equality
    * subtleties), timestamps/dates are range-shaped (zone-map work).
    */
  def supportsType(dt: DataType): Boolean = dt match {
    case StringType | IntegerType | LongType => true
    case _ => false
  }

  /** Distributed build over one directory's column: per-partition
    * filters merged on the driver (`treeAggregate`) — no row ever
    * reaches the driver, only fixed-size bit arrays.
    */
  def build(slice: DataFrame, colName: String, expectedItems: Long): BloomFilter = {
    val dt = slice.schema(colName).dataType
    require(supportsType(dt), s"bloom sidecar unsupported for ${dt.sql}")
    slice.select(col(colName)).na.drop.rdd.treeAggregate(
      BloomFilter.create(math.max(1L, expectedItems), Fpp))(
      (bf, row) => {
        dt match {
          case StringType  => bf.putString(row.getString(0))
          case LongType    => bf.putLong(row.getLong(0))
          case IntegerType => bf.putLong(row.getInt(0).toLong)
        }
        bf
      },
      (a, b) => { a.mergeInPlace(b); a })
  }

  /** Probe dispatch mirroring [[build]]'s insertion types; anything
    * unrecognized (or null, which never equality-matches) answers
    * "maybe" so the dir survives.
    */
  def mightContain(bf: BloomFilter, v: Any): Boolean = v match {
    case null                 => true
    case s: String            => bf.mightContainString(s)
    case u: UTF8String        => bf.mightContainString(u.toString)
    case i: java.lang.Integer => bf.mightContainLong(i.longValue)
    case l: java.lang.Long    => bf.mightContainLong(l.longValue)
    case s: java.lang.Short   => bf.mightContainLong(s.longValue)
    case b: java.lang.Byte    => bf.mightContainLong(b.longValue)
    case _                    => true
  }

  /** Create-only sidecar write; an existing file (concurrent backfill
    * winner) or any IO failure is absorbed — sidecars are advisory.
    */
  def write(conf: Configuration, absDir: String, colName: String,
            bf: BloomFilter): Unit =
    try {
      val p = new Path(absDir, fileName(colName))
      val f = p.getFileSystem(conf)
      if (!f.exists(p)) {
        val tmp = new Path(absDir, s".tmp-${fileName(colName)}-${java.util.UUID.randomUUID()}")
        val out = f.create(tmp, false)
        try bf.writeTo(out) finally out.close()
        if (!f.rename(tmp, p)) f.delete(tmp, false)
      }
    } catch { case scala.util.control.NonFatal(_) => () }

  def exists(conf: Configuration, absDir: String, colName: String): Boolean =
    try new Path(absDir).getFileSystem(conf)
      .exists(new Path(absDir, fileName(colName)))
    catch { case scala.util.control.NonFatal(_) => false }

  // (absolute dir, col) -> parsed sidecar; None caches "absent" so a
  // table without sidecars costs one existence check per dir EVER, not
  // per query. Entries are permanently valid (immutable dirs); the map
  // is cleared wholesale if it somehow grows past the bound.
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), Option[BloomFilter]]()
  private val MaxCacheEntries = 8192

  /** Cached sidecar read; `None` = absent/unreadable = cannot prune. */
  def read(conf: Configuration, absDir: String, colName: String): Option[BloomFilter] = {
    val k = (absDir, colName)
    val hit = cache.get(k)
    if (hit != null) hit
    else {
      val loaded: Option[BloomFilter] =
        try {
          val p = new Path(absDir, fileName(colName))
          val f = p.getFileSystem(conf)
          if (!f.exists(p)) None
          else {
            val in = f.open(p)
            try Some(BloomFilter.readFrom(in)) finally in.close()
          }
        } catch { case scala.util.control.NonFatal(_) => None }
      if (cache.size >= MaxCacheEntries) cache.clear()
      cache.put(k, loaded)
      loaded
    }
  }

  /** Test seam: drop cached entries (e.g. after deleting a sidecar to
    * exercise the conservative no-sidecar path).
    */
  private[graft] def invalidateCache(): Unit = cache.clear()
}
