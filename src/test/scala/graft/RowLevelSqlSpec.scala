package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sinks.ManifestTable
import graft.sources.ManifestIndexSource

/** SQL `UPDATE` / `MERGE INTO` over manifest tables through Spark's
  * row-level-operation planning (`SupportsRowLevelOperations` +
  * `SupportsDelta` — the same framework Iceberg rides), with the
  * merge-on-read commit shape: one atomic manifest publish per
  * statement, tombstones + staged inserts, snapshot isolation across
  * the statement, and pointers that only grow (no dir is ever removed
  * by a row-level statement).
  */
class RowLevelSqlSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = s"${Files.createTempDirectory("graft-rls")}/tbl"
  private def cat = ManifestIndexSource.CatalogName

  private def mkTable(path: String, n: Int = 100, buckets: Int = 4): Unit =
    ManifestTable.write(
      (0 until n).map(i => (i.toLong, s"n-$i", (i % 10) * 1.0))
        .toDF("id", "name", "score"), path, "id", buckets)

  private def contents(path: String): Seq[(Long, String, Double)] =
    ManifestTable.read(spark, path).select("id", "name", "score")
      .as[(Long, String, Double)].collect().toSeq.sorted

  test("UPDATE by key: one commit, merge-on-read delta, snapshot isolation") {
    val path = tmp()
    mkTable(path)
    ManifestIndexSource.ensureRegistered(spark)
    val pre = ManifestTable.currentManifest(spark, path)

    spark.sql(s"UPDATE $cat.`$path` SET name = 'updated', score = 99.0 " +
      "WHERE id = 5")

    val m = ManifestTable.currentManifest(spark, path)
    assert(m.version == pre.version + 1, "exactly one commit per statement")
    // merge-on-read: untouched pointers all still present (only-grow),
    // the touched bucket gained a staged dir + a tombstone entry
    pre.buckets.foreach { case (b, dirs) =>
      assert(dirs.forall(m.buckets.getOrElse(b, Seq.empty).contains),
        s"bucket $b lost a pre-statement dir — row-level must not rewrite")
    }
    assert(m.tombstones.valuesIterator.map(_.size).sum == 1,
      "one tombstoned bucket for a single-key update")

    val got = contents(path)
    assert(got.contains((5L, "updated", 99.0)))
    assert(got.size == 100 && got.count(_._1 == 5L) == 1)
    // snapshot isolation: the pre-statement version still reads intact
    val old = spark.read.option("versionAsOf", pre.version.toString)
    assert(ManifestTable.readVersion(spark, path, pre.version)
      .filter(col("id") === 5).select("name").as[String].head() == "n-5")
  }

  test("UPDATE with a NON-KEY predicate works through the delta scan") {
    val path = tmp()
    mkTable(path)
    ManifestIndexSource.ensureRegistered(spark)
    spark.sql(s"UPDATE $cat.`$path` SET name = concat('hot-', name) " +
      "WHERE score >= 8.0")
    val got = contents(path)
    assert(got.count(_._2.startsWith("hot-")) == 20,
      "ids with i%10 in {8,9}: 20 rows")
    assert(got.filter(_._2.startsWith("hot-")).forall(_._3 >= 8.0))
    assert(got.size == 100)
  }

  test("UPDATE may rewrite the key itself: bucket re-derived, lookups agree") {
    val path = tmp()
    mkTable(path, n = 20, buckets = 4)
    ManifestIndexSource.ensureRegistered(spark)
    spark.sql(s"UPDATE $cat.`$path` SET id = 1005 WHERE id = 5")
    val got = contents(path)
    assert(!got.exists(_._1 == 5L) && got.exists(_._1 == 1005L))
    // the keyed lookup path (driver-side bucket hash) must find the row
    // under its NEW bucket — i.e. the delta writer derived, not copied
    assert(ManifestTable.lookup(spark, path, "id", 1005L)
      .select("name").as[String].collect().toSeq == Seq("n-5"))
    assert(ManifestTable.lookup(spark, path, "id", 5L).isEmpty)
  }

  test("SQL MERGE INTO == API merge, hash-identical, one commit") {
    val pathSql = tmp(); val pathApi = tmp()
    mkTable(pathSql); mkTable(pathApi)
    ManifestIndexSource.ensureRegistered(spark)
    // source: 10 updates (ids 0-9) + 5 inserts (ids 200-204)
    val src = ((0 until 10).map(i => (i.toLong, s"m-$i", -1.0)) ++
      (200 until 205).map(i => (i.toLong, s"new-$i", -2.0)))
      .toDF("id", "name", "score")

    val preV = ManifestTable.currentManifest(spark, pathSql).version
    src.createOrReplaceTempView("rls_merge_src")
    spark.sql(
      s"""MERGE INTO $cat.`$pathSql` t
         |USING (SELECT id, name, score, $cat.bucket(4, id) AS bucket
         |       FROM rls_merge_src) s
         |ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(ManifestTable.currentManifest(spark, pathSql).version == preV + 1,
      "one commit per MERGE statement")

    ManifestTable.merge(spark, pathApi, src, "id")
    assert(contents(pathSql) == contents(pathApi),
      "SQL MERGE and API merge must agree row-for-row")
    assert(contents(pathSql).size == 105)
  }

  test("non-key DELETE takes the row-level path; key DELETE stays metadata-only") {
    val path = tmp()
    mkTable(path)
    ManifestIndexSource.ensureRegistered(spark)

    // key-shaped: OptimizeMetadataOnlyDeleteFromTable routes to
    // SupportsDelete — a pointer/tombstone commit with NO staged dirs
    val preKeyed = ManifestTable.currentManifest(spark, path)
    spark.sql(s"DELETE FROM $cat.`$path` WHERE id = 7")
    val mKeyed = ManifestTable.currentManifest(spark, path)
    assert(mKeyed.buckets == preKeyed.buckets,
      "key-shaped DELETE must not stage data dirs (metadata path)")
    assert(!contents(path).exists(_._1 == 7L))

    // non-key predicate: previously unsupported, now a row-level delete
    spark.sql(s"DELETE FROM $cat.`$path` WHERE score = 3.0 AND id < 50")
    val got = contents(path)
    assert(!got.exists(r => r._3 == 3.0 && r._1 < 50))
    assert(got.size == 99 - 5, s"5 rows with i%10==3, i<50; got ${got.size}")
  }

  test("MERGE with NOT MATCHED BY SOURCE: delete-absent and conditional-update forms") {
    val path = tmp()
    mkTable(path, n = 20, buckets = 4)
    ManifestIndexSource.ensureRegistered(spark)
    // source holds ids 0-9: matched rows update; target rows ABSENT
    // from the source either delete (score < 5) or flag
    (0 until 10).map(i => (i.toLong, s"s-$i", 100.0 + i))
      .toDF("id", "name", "score").createOrReplaceTempView("rls_bys_src")
    spark.sql(
      s"""MERGE INTO $cat.`$path` t
         |USING (SELECT id, name, score, $cat.bucket(4, id) AS bucket
         |       FROM rls_bys_src) s
         |ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET name = s.name, score = s.score
         |WHEN NOT MATCHED BY SOURCE AND t.score < 5.0 THEN DELETE
         |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET name = 'orphan'
         |""".stripMargin)
    val got = contents(path)
    // ids 0-9 updated from source
    (0 until 10).foreach(i => assert(got.contains((i.toLong, s"s-$i", 100.0 + i))))
    // ids 10-19: score = i%10 → 10-14 have score 0-4 → deleted;
    // 15-19 have score 5-9 → flagged
    (10 until 15).foreach(i => assert(!got.exists(_._1 == i.toLong),
      s"id=$i (score ${i % 10}) must be deleted"))
    (15 until 20).foreach(i =>
      assert(got.contains((i.toLong, "orphan", (i % 10).toDouble))))
    assert(got.size == 15)
  }

  test("a wide MERGE clusters delta rows by bucket: file count stays O(buckets)") {
    val path = tmp()
    mkTable(path, n = 2000, buckets = 4)
    ManifestIndexSource.ensureRegistered(spark)
    val pre = ManifestTable.currentManifest(spark, path)
    // 8 source partitions; without the write's clustered distribution
    // every task would write every bucket: O(tasks × buckets) files
    spark.range(0, 4000).repartition(8)
      .select(col("id"), concat(lit("m-"), col("id")).as("name"),
        lit(-1.0).as("score"))
      .createOrReplaceTempView("rls_wide_src")
    spark.sql(
      s"""MERGE INTO $cat.`$path` t
         |USING (SELECT id, name, score, $cat.bucket(4, id) AS bucket
         |       FROM rls_wide_src) s
         |ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val m = ManifestTable.currentManifest(spark, path)
    val newDirs = m.buckets.toSeq.flatMap { case (b, rels) =>
      rels.filterNot(pre.buckets.getOrElse(b, Seq.empty).contains) }
    val dataFiles = newDirs.map(d =>
      new java.io.File(s"$path/$d").listFiles
        .count(_.getName.endsWith(".parquet"))).sum
    assert(newDirs.size == 4 && dataFiles <= 4,
      s"clustered delta write must produce one file per bucket, got " +
        s"$dataFiles files across ${newDirs.size} dirs")
    assert(contents(path).size == 4000)
  }

  test("expression assignments and live tombstones compose with row-level SQL") {
    val path = tmp()
    mkTable(path)
    ManifestIndexSource.ensureRegistered(spark)
    // live equality-delete tombstones first: the row-level scan is
    // merge-on-read, so the statement must see post-delete state
    ManifestTable.deleteKeys(spark, path, Seq(3L, 4L).toDF("id"), "id")
    spark.sql(s"UPDATE $cat.`$path` SET score = score + 0.5 " +
      "WHERE id < 10")
    val got = contents(path)
    assert(!got.exists(r => r._1 == 3L || r._1 == 4L),
      "tombstoned keys must stay deleted through the update")
    (0 until 10).filterNot(Set(3, 4)).foreach { i =>
      assert(got.contains((i.toLong, s"n-$i", (i % 10) + 0.5)),
        s"id=$i must carry score+0.5") }
    assert(got.count(_._3 % 1.0 == 0.5) == 8,
      "exactly the 8 live ids under 10 updated")
  }

  /** Bucket of a key under the table's layout hash — to construct
    * concurrent writes that deliberately touch / avoid the statement's
    * buckets.
    */
  private def bucketOf(path: String, key: Long): Int =
    graft.sources.ManifestBucketPruning.bucketOf(
      ManifestTable.currentManifest(spark, path), key).get

  test("a concurrent append into a TOUCHED bucket fails the statement: no write skew") {
    val path = tmp()
    mkTable(path, n = 50, buckets = 4)
    ManifestIndexSource.ensureRegistered(spark)
    // the hook fires after the UPDATE's executors staged their delta
    // and before its manifest commit — a concurrent writer lands an
    // append in that window carrying a fresh row for key 5, the key
    // the UPDATE touches. Silently rebasing would cover the new dir
    // with the statement's tombstone and delete a row the statement's
    // scan never read (write skew) — the commit must refuse instead
    // (Delta/Iceberg's default-isolation conflict failure).
    var fired = false
    ManifestTable.deltaPreCommitHook = () => if (!fired) {
      fired = true
      ManifestTable.append(spark, path,
        Seq((900L, "late", -1.0), (5L, "late-5", -2.0))
          .toDF("id", "name", "score"), "id")
    }
    val ex = intercept[Exception] {
      try spark.sql(s"UPDATE $cat.`$path` SET name = 'won' WHERE id = 5")
      finally ManifestTable.deltaPreCommitHook = () => ()
    }
    assert(fired, "seam must have fired")
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: chain(t.getCause)
    assert(chain(ex).exists(
      _.isInstanceOf[java.util.ConcurrentModificationException]),
      s"expected a ConcurrentModificationException in the chain, got $ex")
    // the failed statement left no trace: the concurrent append's rows
    // are both intact (key 5 now has its two pre-statement-outcome
    // rows — the base row and the append's), nothing says 'won'
    val got = contents(path)
    assert(got.contains((900L, "late", -1.0)))
    assert(got.contains((5L, "n-5", 5.0)) && got.contains((5L, "late-5", -2.0)),
      s"aborted statement must not have deleted anything, got " +
        s"${got.filter(_._1 == 5L)}")
    assert(!got.exists(_._2 == "won"), "aborted statement must not apply")
    assert(got.size == 52)
  }

  test("a concurrent append into DISJOINT buckets commutes: both effects land") {
    val path = tmp()
    mkTable(path, n = 50, buckets = 4)
    ManifestIndexSource.ensureRegistered(spark)
    // a concurrent key that hashes AWAY from key 5's bucket: drift
    // confined to untouched buckets must not serialize against the
    // statement — concurrent writers on disjoint keys both win
    val other = (900L to 950L).find(k => bucketOf(path, k) != bucketOf(path, 5L)).get
    var fired = false
    ManifestTable.deltaPreCommitHook = () => if (!fired) {
      fired = true
      ManifestTable.append(spark, path,
        Seq((other, "late", -1.0)).toDF("id", "name", "score"), "id")
    }
    try spark.sql(s"UPDATE $cat.`$path` SET name = 'won' WHERE id = 5")
    finally ManifestTable.deltaPreCommitHook = () => ()
    assert(fired, "seam must have fired")
    val got = contents(path)
    assert(got.contains((other, "late", -1.0)),
      "concurrent append on a disjoint bucket must survive")
    assert(got.count(_._1 == 5L) == 1 &&
      got.exists(r => r._1 == 5L && r._2 == "won"),
      s"key 5 must resolve to the update exactly once, got " +
        s"${got.filter(_._1 == 5L)}")
    assert(got.size == 51)
  }

  test("row-level SQL composes with schema evolution: new columns update and null-fill") {
    val path = tmp()
    mkTable(path, n = 20, buckets = 4)
    ManifestIndexSource.ensureRegistered(spark)
    spark.sql(s"GRAFT ADD COLUMNS '$path' (tag STRING)")
    // the evolved column is writable by UPDATE; untouched rows read NULL
    spark.sql(s"UPDATE $cat.`$path` SET tag = 'hot' WHERE id < 3")
    val got = ManifestTable.read(spark, path)
      .select("id", "tag").as[(Long, Option[String])].collect().toMap
    assert((0L until 3L).forall(k => got(k).contains("hot")))
    assert((3L until 20L).forall(k => got(k).isEmpty),
      "pre-evolution rows must stay NULL through the delta rewrite")
  }

  test("INSERT OVERWRITE and TRUNCATE TABLE complete the SQL write surface") {
    val path = tmp()
    mkTable(path, n = 30, buckets = 4)
    ManifestIndexSource.ensureRegistered(spark)
    val preV = ManifestTable.currentManifest(spark, path).version
    // whole-table overwrite, reading the table's own pre-statement
    // snapshot (loadTable pins it) — one atomic replace commit
    spark.sql(s"INSERT OVERWRITE $cat.`$path` " +
      s"SELECT id, concat('ow-', name) AS name, score, bucket " +
      s"FROM $cat.`$path` WHERE id < 5")
    val m = ManifestTable.currentManifest(spark, path)
    assert(m.version == preV + 1, "one commit per INSERT OVERWRITE")
    val got = contents(path)
    assert(got.size == 5 && got.forall(_._2.startsWith("ow-")),
      s"overwrite must replace contents, got $got")
    assert(ManifestTable.readVersion(spark, path, preV).count() == 30,
      "pre-overwrite snapshot must survive for time travel")

    // TRUNCATE TABLE rides TruncatableTable: pointer-only commit
    spark.sql(s"TRUNCATE TABLE $cat.`$path`")
    assert(ManifestTable.read(spark, path).isEmpty)
    assert(ManifestTable.readVersion(spark, path, preV + 1).count() == 5,
      "pre-truncate snapshot must survive")
  }

  test("zero-match statements commit nothing") {
    val path = tmp()
    mkTable(path, n = 10)
    ManifestIndexSource.ensureRegistered(spark)
    val pre = ManifestTable.currentManifest(spark, path).version
    spark.sql(s"UPDATE $cat.`$path` SET name = 'x' WHERE id = 99999")
    assert(ManifestTable.currentManifest(spark, path).version == pre,
      "an UPDATE matching zero rows must not commit a version")
  }
}
