package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sinks.{BloomSidecar, ManifestTable}
import graft.sources.ManifestIndexSource

/** Bloom sidecars serve the predicate class zone maps cannot: EQUALITY
  * on high-cardinality, uniformly-distributed values (UUIDs, content
  * hashes), where every dir's [min,max] spans the whole domain. The
  * fixtures use md5 hex ids so the string zone maps genuinely cannot
  * prune (every commit's bounds overlap) — any dir cut observed here is
  * the bloom's. Pruning must be conservative: a missing sidecar, an
  * unreadable file, or an unsupported type must widen the scan, never
  * narrow it.
  */
class BloomSidecarSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = s"${Files.createTempDirectory("graft-bloom")}/tbl"

  /** One commit's rows: md5 ext ids span the full hex domain in every
    * commit, so per-dir string bounds are useless for equality.
    */
  private def batch(tag: String, ids: Range): DataFrame =
    ids.map(i => (i.toLong, s"$tag-$i"))
      .toDF("id", "seed")
      .select(col("id"), md5(col("seed")).as("ext_id"),
        (col("id") * 10).as("val"))

  private def extId(tag: String, i: Int): String =
    org.apache.commons.codec.digest.DigestUtils.md5Hex(s"$tag-$i")

  private def planned(path: String,
                      filters: org.apache.spark.sql.sources.Filter*): Int = {
    val m = ManifestTable.currentManifest(spark, path)
    val b = new graft.sources.ManifestIndexTable(
        path, m, spark.sparkContext.hadoopConfiguration)
      .newScanBuilder(new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Collections.emptyMap()))
    b.asInstanceOf[org.apache.spark.sql.connector.read.SupportsPushDownFilters]
      .pushFilters(filters.toArray)
    b.build().asInstanceOf[graft.sources.ManifestIndexScan]
      .planInputPartitions().count(
        _.asInstanceOf[graft.sources.ManifestBucketPartition].files.nonEmpty)
  }

  test("point lookups skip dirs via sidecars; results identical to the unpruned read") {
    val path = tmp()
    ManifestTable.write(batch("a", 0 until 200), path, "id", 4,
      bloomCols = Seq("ext_id"))
    ManifestTable.append(spark, path, batch("b", 200 until 400), "id")
    ManifestTable.append(spark, path, batch("c", 400 until 600), "id")
    ManifestIndexSource.ensureRegistered(spark)

    assert(planned(path) == 12, "4 buckets × 3 commits expected")
    // string zone maps alone cannot cut md5-distributed ids: bounds of
    // every dir overlap every probe. The bloom keeps only the one dir
    // actually holding the row (3% fpp → an occasional extra survives)
    val probe = extId("b", 250)
    val kept = planned(path, org.apache.spark.sql.sources.EqualTo("ext_id", probe))
    assert(kept >= 1 && kept <= 3, s"bloom cut absent: kept $kept of 12 dirs")

    // exactness end-to-end through SQL, with the cut visible in EXPLAIN
    val t = s"graft_manifest.`$path`"
    val q = spark.sql(s"SELECT id, val FROM $t WHERE ext_id = '$probe'")
    assert(q.collect().map(_.toString).toSeq == Seq(s"[250,2500]"))
    val desc = q.queryExecution.executedPlan.toString
    assert(desc.contains("dirs="), s"dir cut not visible in plan:\n$desc")

    // IN-list: union of the members' survivors
    val keptIn = planned(path, org.apache.spark.sql.sources.In("ext_id",
      Array[Any](extId("a", 10), extId("c", 450))))
    assert(keptIn >= 2 && keptIn <= 5, s"IN cut wrong: $keptIn")

    // negative probe: nothing (modulo fpp) survives, result is empty
    val keptNeg = planned(path,
      org.apache.spark.sql.sources.EqualTo("ext_id", extId("zzz", 1)))
    assert(keptNeg <= 2, s"negative probe kept $keptNeg dirs")
    assert(spark.sql(
      s"SELECT * FROM $t WHERE ext_id = '${extId("zzz", 1)}'").isEmpty)
  }

  test("missing or deleted sidecars are conservative; unsupported shapes never consult blooms") {
    val path = tmp()
    ManifestTable.write(batch("a", 0 until 100), path, "id", 2,
      bloomCols = Seq("ext_id"))
    ManifestTable.append(spark, path, batch("b", 100 until 200), "id")
    val m = ManifestTable.currentManifest(spark, path)
    val probe = extId("a", 50)
    val before = planned(path, org.apache.spark.sql.sources.EqualTo("ext_id", probe))
    // delete every sidecar: the probe must now keep ALL dirs (no sidecar
    // → cannot prune), and answers stay exact
    val conf = spark.sparkContext.hadoopConfiguration
    m.buckets.values.flatten.foreach { rel =>
      val p = new org.apache.hadoop.fs.Path(s"$path/$rel",
        BloomSidecar.fileName("ext_id"))
      p.getFileSystem(conf).delete(p, false)
    }
    BloomSidecar.invalidateCache()
    val after = planned(path, org.apache.spark.sql.sources.EqualTo("ext_id", probe))
    assert(after == 4, s"sidecar-less probe must keep all 4 dirs, kept $after")
    assert(before <= after)
    ManifestIndexSource.ensureRegistered(spark)
    assert(spark.sql(
      s"SELECT id FROM graft_manifest.`$path` WHERE ext_id = '$probe'")
      .as[Long].collect().toSeq == Seq(50L))
    // range shapes never consult blooms (still all dirs, no error)
    assert(planned(path,
      org.apache.spark.sql.sources.GreaterThan("ext_id", "00")) >= after - 1)
  }

  test("setBloomColumns backfills existing dirs create-only; later commits sidecar automatically") {
    val path = tmp()
    ManifestTable.write(batch("a", 0 until 100), path, "id", 2)
    ManifestTable.append(spark, path, batch("b", 100 until 200), "id")
    // no sidecars yet: nothing prunes
    assert(planned(path, org.apache.spark.sql.sources.EqualTo(
      "ext_id", extId("a", 5))) == 4)

    ManifestTable.setBloomColumns(spark, path, Seq("ext_id"))
    val conf = spark.sparkContext.hadoopConfiguration
    val m = ManifestTable.currentManifest(spark, path)
    assert(m.bloomCols == Seq("ext_id"))
    m.buckets.values.flatten.foreach { rel =>
      assert(BloomSidecar.exists(conf, s"$path/$rel", "ext_id"),
        s"backfill missed $rel") }
    BloomSidecar.invalidateCache()
    val kept = planned(path, org.apache.spark.sql.sources.EqualTo(
      "ext_id", extId("a", 5)))
    assert(kept >= 1 && kept <= 2, s"backfilled bloom cut absent: $kept")

    // a post-enable append gets sidecars at publish, no backfill needed
    ManifestTable.append(spark, path, batch("c", 200 until 300), "id")
    val m2 = ManifestTable.currentManifest(spark, path)
    (m2.buckets.values.flatten.toSet -- m.buckets.values.flatten.toSet)
      .foreach { rel =>
        assert(BloomSidecar.exists(conf, s"$path/$rel", "ext_id"),
          s"new dir $rel missing sidecar") }
    // rewrites (OPTIMIZE) re-sidecar the rewritten dirs
    ManifestTable.optimize(spark, path, targetFileBytes = 1L << 30)
    val m3 = ManifestTable.currentManifest(spark, path)
    m3.buckets.values.flatten.foreach { rel =>
      assert(BloomSidecar.exists(conf, s"$path/$rel", "ext_id"),
        s"optimized dir $rel missing sidecar") }
  }

  test("keyed lookup reads only the dirs whose filter might hold the key") {
    val path = tmp()
    def keyed(tag: String, ids: Range): DataFrame =
      ids.map(i => (org.apache.commons.codec.digest.DigestUtils
        .md5Hex(s"$tag-$i"), i.toLong)).toDF("k", "v")
    ManifestTable.write(keyed("a", 0 until 100), path, "k", 2,
      bloomCols = Seq("k"))
    (1 to 5).foreach(c =>
      ManifestTable.append(spark, path, keyed(s"t$c", 0 until 100), "k"))
    // 6 commits → up to 6 dirs in the key's bucket; the bloom cut keeps
    // ~1 of them, visible in the files the plan actually reads
    val key = org.apache.commons.codec.digest.DigestUtils.md5Hex("t3-42")
    val hit = ManifestTable.lookup(spark, path, "k", key)
    assert(hit.select("k", "v").as[(String, Long)].collect().toSeq ==
      Seq((key, 42L)))
    val allDirsFiles = ManifestTable.read(spark, path).inputFiles.length
    val lookupFiles = hit.inputFiles.length
    assert(lookupFiles < allDirsFiles / 2,
      s"lookup read $lookupFiles of $allDirsFiles files — bloom cut absent")
    // absent key: zero rows regardless of surviving dirs
    assert(ManifestTable.lookup(spark, path, "k",
      org.apache.commons.codec.digest.DigestUtils.md5Hex("nope-1")).isEmpty)
  }

  test("row-group pushdown: the vectorized reader skips groups the predicate excludes; rows intact") {
    import org.apache.spark.sql.types.StructType
    import graft.sources.{ManifestVectorizedReader => MVR}
    val dir = s"${Files.createTempDirectory("graft-rg")}/data"
    // one file, many row groups (tiny block size), id-sorted so each
    // group's footer stats span a narrow id range
    spark.range(200000)
      .select(col("id"), md5(col("id").cast("string")).as("pad"))
      .coalesce(1).sortWithinPartitions("id")
      .write.option("parquet.block.size", (64 * 1024).toString).parquet(dir)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).toSeq
    assert(files.size == 1)
    val schema = StructType.fromDDL("id BIGINT")
    def rowsRead(conf: org.apache.hadoop.conf.Configuration): Long = {
      val r = new graft.sources.ManifestVectorizedReader(files, conf)
      try {
        var n = 0L
        while (r.next()) n += r.get().numRows()
        n
      } finally r.close()
    }
    val base = MVR.taskConf(schema, spark.sessionState.newHadoopConf())
    val all = rowsRead(base)
    assert(all == 200000L)
    val filtered = rowsRead(MVR.withFilterPredicate(base, schema,
      Seq(org.apache.spark.sql.sources.EqualTo("id", 123456L))))
    assert(filtered > 0 && filtered < all / 4,
      s"row-group skip absent: read $filtered of $all rows for a point lookup")
    // range predicate skips proportionally
    val ranged = rowsRead(MVR.withFilterPredicate(base, schema,
      Seq(org.apache.spark.sql.sources.GreaterThan("id", 190000L))))
    assert(ranged < all / 4 && ranged >= 10000L,
      s"range skip wrong: $ranged")
  }

  test("in-file parquet blooms: staged files carry them for bloomCols; hash-column probes skip row groups stats cannot") {
    import org.apache.spark.sql.types.StructType
    import graft.sources.{ManifestVectorizedReader => MVR}
    // 1) ManifestTable staging writes parquet bloom filters for the
    //    manifest's bloom columns — visible in the footer metadata
    val path = tmp()
    ManifestTable.write(batch("a", 0 until 500), path, "id", 2,
      bloomCols = Seq("ext_id"))
    val conf = spark.sparkContext.hadoopConfiguration
    val m = ManifestTable.currentManifest(spark, path)
    val aFile = {
      val rel = m.buckets.values.flatten.head
      new java.io.File(s"$path/$rel").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
    }
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(aFile.getAbsolutePath), conf))
    try {
      import scala.jdk.CollectionConverters._
      val cc = reader.getFooter.getBlocks.asScala.head.getColumns.asScala
        .find(_.getPath.toDotString == "ext_id").get
      assert(cc.getBloomFilterOffset >= 0,
        "staged file must carry a bloom filter for the bloom column")
    } finally reader.close()

    // 2) end-to-end: with many row groups of hash-distributed strings,
    //    footer min/max spans every probe (stats prune nothing) but the
    //    bloom drops the groups without the value
    val dir = s"${Files.createTempDirectory("graft-pbloom")}/data"
    spark.range(200000)
      .select(col("id"), md5(col("id").cast("string")).as("ext_id"))
      .coalesce(1).sortWithinPartitions("id")
      .write.option("parquet.block.size", (64 * 1024).toString)
      .option("parquet.bloom.filter.enabled#ext_id", "true")
      .parquet(dir)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).toSeq
    val schema = StructType.fromDDL("ext_id STRING")
    def rowsRead(c: org.apache.hadoop.conf.Configuration): Long = {
      val r = new graft.sources.ManifestVectorizedReader(files, c)
      try { var n = 0L; while (r.next()) n += r.get().numRows(); n }
      finally r.close()
    }
    val base = MVR.taskConf(schema, spark.sessionState.newHadoopConf())
    assert(rowsRead(base) == 200000L)
    val probe = org.apache.commons.codec.digest.DigestUtils.md5Hex("123456")
    val filtered = rowsRead(MVR.withFilterPredicate(base, schema,
      Seq(org.apache.spark.sql.sources.EqualTo("ext_id", probe))))
    assert(filtered > 0 && filtered < 200000L / 4,
      s"bloom row-group skip absent: read $filtered of 200000 rows")
  }

  test("integral columns probe via putLong/mightContainLong consistently") {
    val path = tmp()
    // scrambled longs: every commit spans the whole domain, zone maps
    // can't isolate a point, blooms can
    def b(tag: Int, ids: Range): DataFrame =
      ids.map(i => (i.toLong + tag * 1000,
        (i.toLong * 2654435761L + tag) % 1000003L)).toDF("id", "ref")
    ManifestTable.write(b(1, 0 until 200), path, "id", 2,
      bloomCols = Seq("ref"))
    ManifestTable.append(spark, path, b(2, 0 until 200), "id")
    ManifestTable.append(spark, path, b(3, 0 until 200), "id")
    val probe = (57L * 2654435761L + 2) % 1000003L
    val kept = planned(path, org.apache.spark.sql.sources.EqualTo("ref", probe))
    assert(kept >= 1 && kept <= 3, s"long bloom cut absent: kept $kept of 6")
    ManifestIndexSource.ensureRegistered(spark)
    val got = spark.sql(
      s"SELECT id FROM graft_manifest.`$path` WHERE ref = $probe")
      .as[Long].collect().toSet
    val want = ManifestTable.read(spark, path)
      .filter(col("ref") === probe).select("id").as[Long].collect().toSet
    assert(got == want && want.nonEmpty)
  }
}
