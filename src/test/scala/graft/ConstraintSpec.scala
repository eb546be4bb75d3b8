package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sinks.ManifestTable
import graft.sources.ManifestIndexSource

/** Table CHECK constraints (Delta parity): ADD validates the existing
  * data first; the recorded expression is then enforced on every
  * NEW-row write path — API append/upsert/merge, SQL INSERT / INSERT
  * OVERWRITE, row-level UPDATE/MERGE inserts — with SQL NULL semantics
  * (violated means IS FALSE, NULL passes). Constraints survive
  * rewrites and travel with RESTORE; columns a constraint checks
  * cannot be dropped or renamed out from under it; a concurrent ADD
  * CONSTRAINT conflicts with in-flight executor-staged statements
  * rather than admitting unvalidated rows.
  */
class ConstraintSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = s"${Files.createTempDirectory("graft-chk")}/tbl"
  private def cat = ManifestIndexSource.CatalogName

  private def mkTable(path: String, n: Int = 20): Unit =
    ManifestTable.write(
      (0 until n).map(i => (i.toLong, s"n-$i", i * 1.0))
        .toDF("id", "name", "score"), path, "id", 4)

  test("ADD CONSTRAINT validates existing data; bad expressions refuse") {
    val path = tmp()
    mkTable(path)
    ManifestIndexSource.ensureRegistered(spark)
    val v0 = ManifestTable.currentManifest(spark, path).version

    // violated by existing rows (score 0..19, demand > 5): refused, no commit
    val e = intercept[IllegalArgumentException] {
      ManifestTable.addConstraint(spark, path, "big", "score > 5")
    }
    assert(e.getMessage.contains("existing rows violate"))
    // unresolvable column / non-boolean / unsafe charset: refused
    intercept[IllegalArgumentException] {
      ManifestTable.addConstraint(spark, path, "ghost", "nope > 1") }
    intercept[IllegalArgumentException] {
      ManifestTable.addConstraint(spark, path, "notbool", "score + 1") }
    intercept[IllegalArgumentException] {
      ManifestTable.addConstraint(spark, path, "quoted", "name <> \"x\"") }
    intercept[IllegalArgumentException] { // manifest-field alias refused
      ManifestTable.addConstraint(spark, path, "txns", "score >= 0") }
    intercept[IllegalArgumentException] { // engine-internal column
      ManifestTable.addConstraint(spark, path, "b0", "bucket >= 0") }
    assert(ManifestTable.currentManifest(spark, path).version == v0,
      "refused constraints must not commit")

    // a satisfiable one lands as one metadata commit and DESCRIBE shows it
    ManifestTable.addConstraint(spark, path, "nonneg", "score >= 0")
    val m = ManifestTable.currentManifest(spark, path)
    assert(m.version == v0 + 1 && m.constraints == Map("nonneg" -> "score >= 0"))
    val d = spark.sql(s"GRAFT DESCRIBE '$path'").collect().head
    assert(d.getString(12) == "nonneg CHECK (score >= 0)")
  }

  test("constraints are enforced on every new-row write path; NULL passes") {
    val path = tmp()
    mkTable(path)
    ManifestIndexSource.ensureRegistered(spark)
    spark.sql(s"GRAFT ADD CONSTRAINT '$path' nonneg CHECK (score >= 0)")
    val v1 = ManifestTable.currentManifest(spark, path).version

    def violates(f: => Unit): Unit = {
      val e = intercept[Exception](f)
      def chain(t: Throwable): Seq[Throwable] =
        if (t == null) Seq.empty else t +: chain(t.getCause)
      assert(chain(e).exists(c => Option(c.getMessage)
          .exists(_.contains("CHECK constraint nonneg"))),
        s"failure must name the constraint, got: $e")
    }

    // API append / upsert / merge
    violates(ManifestTable.append(spark, path,
      Seq((100L, "bad", -1.0)).toDF("id", "name", "score"), "id"))
    violates(ManifestTable.upsert(spark, path,
      Seq((5L, "bad", -2.0)).toDF("id", "name", "score"), "id"))
    violates(ManifestTable.merge(spark, path,
      Seq((6L, "bad", -3.0)).toDF("id", "name", "score"), "id"))
    // SQL INSERT and row-level UPDATE
    violates(spark.sql(s"INSERT INTO $cat.`$path` " +
      s"SELECT 101L, 'bad', -4.0, $cat.bucket(4, 101L)"))
    violates(spark.sql(s"UPDATE $cat.`$path` SET score = -9.0 WHERE id = 3"))
    // nothing above may have committed or changed data
    val m = ManifestTable.currentManifest(spark, path)
    assert(m.version == v1, "violating statements must not commit")
    assert(ManifestTable.read(spark, path).count() == 20)
    assert(ManifestTable.read(spark, path)
      .filter(col("score") < 0).isEmpty)

    // valid writes pass on every path; NULL evaluates as pass
    ManifestTable.append(spark, path,
      Seq((100L, "ok", 1.0)).toDF("id", "name", "score"), "id")
    spark.sql(s"INSERT INTO $cat.`$path` " +
      s"SELECT 101L, 'ok', 2.0, $cat.bucket(4, 101L)")
    spark.sql(s"UPDATE $cat.`$path` SET score = 42.0 WHERE id = 3")
    ManifestTable.append(spark, path,
      Seq((102L, "nullscore", null.asInstanceOf[java.lang.Double]))
        .toDF("id", "name", "score"), "id")
    val got = ManifestTable.read(spark, path)
    assert(got.count() == 23)
    assert(got.filter(col("id") === 3).select("score")
      .as[Double].head() == 42.0)
    assert(got.filter(col("id") === 102).select("score")
      .as[Option[Double]].head().isEmpty,
      "NULL passes a CHECK per SQL semantics")
  }

  test("constraints survive rewrites and RESTORE; DROP lifts enforcement") {
    val path = tmp()
    mkTable(path)
    ManifestIndexSource.ensureRegistered(spark)
    ManifestTable.addConstraint(spark, path, "nonneg", "score >= 0")
    val constrainedV = ManifestTable.currentManifest(spark, path).version

    ManifestTable.compact(spark, path, maxDirs = 1)
    ManifestTable.rebucket(spark, path, 8)
    ManifestTable.optimize(spark, path)
    assert(ManifestTable.currentManifest(spark, path).constraints
      .contains("nonneg"), "maintenance must preserve constraints")

    spark.sql(s"GRAFT DROP CONSTRAINT '$path' nonneg")
    intercept[IllegalArgumentException] {
      ManifestTable.dropConstraint(spark, path, "nonneg") } // gone
    ManifestTable.append(spark, path,
      Seq((200L, "neg", -1.0)).toDF("id", "name", "score"), "id")
    assert(ManifestTable.read(spark, path).filter(col("score") < 0).count() == 1)

    // RESTORE to the constrained version brings the constraint back
    // WITH the data that satisfied it
    ManifestTable.restore(spark, path, constrainedV)
    assert(ManifestTable.currentManifest(spark, path).constraints
      .contains("nonneg"))
    intercept[Exception] { ManifestTable.append(spark, path,
      Seq((201L, "neg", -2.0)).toDF("id", "name", "score"), "id") }
  }

  test("whole-table write() keeps the constraint set and validates the new rows") {
    val path = tmp()
    mkTable(path)
    ManifestTable.addConstraint(spark, path, "nonneg", "score >= 0")

    // a violating replacement refuses — the constraint guards write()
    // exactly like append/upsert/merge/INSERT OVERWRITE
    intercept[Exception] {
      ManifestTable.write(Seq((1L, "bad", -5.0)).toDF("id", "name", "score"),
        path, "id", 4)
    }
    // a clean replacement commits AND the constraint survives it
    ManifestTable.write(Seq((1L, "ok", 7.0)).toDF("id", "name", "score"),
      path, "id", 4)
    val m = ManifestTable.currentManifest(spark, path)
    assert(m.constraints == Map("nonneg" -> "score >= 0"),
      "write() must carry the table's CHECK constraints forward")
    intercept[Exception] { ManifestTable.append(spark, path,
      Seq((2L, "neg", -1.0)).toDF("id", "name", "score"), "id") }
  }

  test("a column a constraint checks cannot be dropped or renamed") {
    val path = tmp()
    mkTable(path)
    ManifestTable.addConstraint(spark, path, "named", "length(name) > 0")
    val e1 = intercept[IllegalArgumentException] {
      ManifestTable.dropColumns(spark, path, Seq("name")) }
    assert(e1.getMessage.contains("named"))
    val e2 = intercept[IllegalArgumentException] {
      ManifestTable.renameColumn(spark, path, "name", "label") }
    assert(e2.getMessage.contains("named"))
    // a string literal containing the column name is NOT a reference
    ManifestTable.addConstraint(spark, path, "lit_only", "name <> 'score'")
    ManifestTable.dropColumns(spark, path, Seq("score"))
    // after dropping the constraint the column is droppable
    ManifestTable.dropConstraint(spark, path, "named")
    ManifestTable.dropConstraint(spark, path, "lit_only")
    ManifestTable.renameColumn(spark, path, "name", "label")
    assert(ManifestTable.currentManifest(spark, path)
      .schema.fieldNames.toSeq.startsWith(Seq("id", "label")))
  }

  test("streaming toTable enforces constraints; a violating epoch fails, commits nothing") {
    val path = tmp()
    mkTable(path)
    ManifestIndexSource.ensureRegistered(spark)
    ManifestTable.addConstraint(spark, path, "nonneg", "score >= 0")
    val base = Files.createTempDirectory("graft-chk-stream").toString
    val landing = s"$base/landing"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(landing))
    def land(name: String, ids: Seq[Long]): Unit =
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$landing/$name"),
        ids.mkString("", "\n", "\n"))
    def stream(): Unit =
      spark.readStream.text(landing)
        .select(col("value").cast("long").as("id"))
        .select(col("id"), lit("s").as("name"),
          // ids ≥ 9000 carry a violating score
          when(col("id") < 9000, 1.0).otherwise(-5.0).as("score"))
        .withColumn("bucket", pmod(xxhash64(col("id")), lit(4L)).cast("int"))
        .writeStream
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .toTable(s"$cat.`$path`")
        .awaitTermination(120000)

    land("ok.txt", Seq(8000L, 8001L))
    stream()
    assert(ManifestTable.read(spark, path).filter(col("id") >= 8000).count() == 2)
    val v = ManifestTable.versions(spark, path).max
    land("bad.txt", Seq(9001L))
    val e = intercept[Exception](stream())
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: chain(t.getCause)
    assert(chain(e).exists(c => Option(c.getMessage)
        .exists(_.contains("CHECK constraint nonneg"))), s"got $e")
    assert(ManifestTable.versions(spark, path).max == v &&
      ManifestTable.read(spark, path).filter(col("id") >= 9000).isEmpty,
      "violating epoch must not commit")
  }

  test("GRAFT VERIFY: healthy tables pass every audit; planted damage is named") {
    val path = tmp()
    mkTable(path)
    ManifestIndexSource.ensureRegistered(spark)
    ManifestTable.setBloomColumns(spark, path, Seq("id"))
    ManifestTable.addConstraint(spark, path, "nonneg", "score >= 0")
    ManifestTable.deleteKeys(spark, path, Seq(3L).toDF("id"), "id")

    def checks(deep: Boolean): Map[String, (String, String)] =
      spark.sql(s"GRAFT VERIFY '$path'" + (if (deep) " DEEP" else ""))
        .collect().map(r => r.getString(1) -> (r.getString(2), r.getString(3)))
        .toMap

    val fast = checks(deep = false)
    assert(Seq("schema", "referenced_dirs", "file_lists", "tombstones",
      "constraints_resolve", "bloom_sidecars").forall(c =>
        fast.get(c).exists(_._1 == "ok")), s"fast checks: $fast")
    assert(!fast.contains("zone_bounds"), "data audits are DEEP-only")
    val deep = checks(deep = true)
    assert(Seq("zone_bounds", "constraint_data", "duplicate_keys",
      "null_keys").forall(c => deep.get(c).exists(_._1 == "ok")),
      s"deep checks: $deep")

    // planted damage, each named by its check:
    // (a) a data file vanishes → file_lists (dir itself still exists)
    val m = ManifestTable.currentManifest(spark, path)
    val someDir = m.buckets.values.flatten.toSeq.sorted.head
    val dirFile = new java.io.File(s"$path/$someDir").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val bytes = java.nio.file.Files.readAllBytes(dirFile.toPath)
    assert(dirFile.delete())
    val broken = checks(deep = false)
    assert(broken("file_lists")._1 == "FAIL" &&
      broken("file_lists")._2.contains("missing"), s"got $broken")
    java.nio.file.Files.write(dirFile.toPath, bytes) // heal
    assert(checks(deep = false)("file_lists")._1 == "ok")

    // (b) zone bounds tampered in the manifest → DEEP zone_bounds
    val cur = ManifestTable.currentManifest(spark, path)
    val victim = cur.buckets.values.flatten.toSeq.sorted.head
    ManifestTable.publish(spark, path, cur.copy(version = cur.version + 1,
      dirStats = cur.dirStats.updated(victim,
        cur.dirStats.getOrElse(victim, Map.empty)
          .updated("score", ("0.0", "0.5")))))
    val tampered = checks(deep = true)
    assert(tampered("zone_bounds")._1 == "FAIL" &&
      tampered("zone_bounds")._2.contains("outside recorded"),
      s"got ${tampered("zone_bounds")}")

    // (c) a constraint referencing a ghost column → constraints_resolve
    val cur2 = ManifestTable.currentManifest(spark, path)
    ManifestTable.publish(spark, path, cur2.copy(version = cur2.version + 1,
      constraints = cur2.constraints + ("ghostly" -> "ghost > 1")))
    assert(checks(deep = false)("constraints_resolve")._1 == "FAIL")

    // (d) a constraint the live data violates (snuck in without
    //     ADD's validation scan) → DEEP constraint_data
    val cur3 = ManifestTable.currentManifest(spark, path)
    ManifestTable.publish(spark, path, cur3.copy(version = cur3.version + 1,
      constraints = cur2.constraints + ("impossible" -> "score > 100")))
    val viol = checks(deep = true)
    assert(viol("constraint_data")._1 == "FAIL" &&
      viol("constraint_data")._2.contains("impossible"),
      s"got ${viol("constraint_data")}")
  }

  test("a concurrent ADD CONSTRAINT conflicts with an in-flight row-level statement") {
    val path = tmp()
    mkTable(path)
    ManifestIndexSource.ensureRegistered(spark)
    // the UPDATE's executors staged rows validated under ZERO
    // constraints; a constraint landing before its commit must fail
    // the statement — its staged rows were never checked
    var fired = false
    ManifestTable.deltaPreCommitHook = () => if (!fired) {
      fired = true
      ManifestTable.addConstraint(spark, path, "late", "score < 1000")
    }
    val ex = intercept[Exception] {
      try spark.sql(s"UPDATE $cat.`$path` SET score = 7.0 WHERE id = 5")
      finally ManifestTable.deltaPreCommitHook = () => ()
    }
    assert(fired)
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: chain(t.getCause)
    assert(chain(ex).exists(
      _.isInstanceOf[java.util.ConcurrentModificationException]), s"got $ex")
    assert(ManifestTable.read(spark, path)
      .filter(col("id") === 5).select("score").as[Double].head() == 5.0,
      "conflicted statement must not apply")
  }
}
