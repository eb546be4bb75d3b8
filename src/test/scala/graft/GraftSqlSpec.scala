package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sinks.ManifestTable
import graft.sources.ManifestIndexSource

/** The GRAFT maintenance SQL surface must (a) drive exactly the Scala
  * maintenance verbs, (b) report the committed version, (c) refuse
  * malformed statements loudly at parse time, and (d) NEVER perturb
  * standard SQL — the parser is prefix-gated and everything else
  * delegates.
  */
class GraftSqlSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = s"${Files.createTempDirectory("graft-sql")}/tbl"

  test("OPTIMIZE / VACUUM / REBUCKET / ADD COLUMNS drive the maintenance verbs from SQL") {
    val path = tmp()
    ManifestTable.write(
      (0 until 200).map(i => (i.toLong, s"n-$i", (i % 50) * 1.0, (i / 50).toLong))
        .toDF("id", "name", "score", "band"), path, "id", 2)
    (1 to 5).foreach(_ => ManifestTable.append(spark, path,
      Seq((999L, "x", 0.0, 0L)).toDF("id", "name", "score", "band"), "id"))

    // bin-packing OPTIMIZE folds the fragmented buckets
    val r1 = spark.sql(s"GRAFT OPTIMIZE '$path'").collect().head
    assert(r1.getString(1) == "optimize")
    assert(ManifestTable.currentManifest(spark, path).buckets.values
      .forall(_.size == 1), "SQL OPTIMIZE must bin-pack")

    // ZORDER BY reslices — dirs per bucket = SLICES
    spark.sql(s"GRAFT OPTIMIZE '$path' ZORDER BY (score, band) SLICES 4")
    val m = ManifestTable.currentManifest(spark, path)
    assert(m.buckets.values.forall(_.size == 4),
      s"SQL ZORDER must reslice: ${m.buckets.view.mapValues(_.size).toMap}")

    // ADD COLUMNS evolves; REBUCKET resizes; VACUUM retires history
    spark.sql(s"GRAFT ADD COLUMNS '$path' (tag STRING)")
    assert(ManifestTable.currentManifest(spark, path)
      .schema.fieldNames.contains("tag"))
    val r2 = spark.sql(s"GRAFT REBUCKET '$path' TO 8").collect().head
    assert(ManifestTable.currentManifest(spark, path).nBuckets == 8)
    assert(r2.getString(2).toInt ==
      ManifestTable.currentManifest(spark, path).version)
    // SET BLOOM backfills sidecars for the referenced dirs
    spark.sql(s"GRAFT SET BLOOM '$path' (id)")
    val mb = ManifestTable.currentManifest(spark, path)
    assert(mb.bloomCols == Seq("id"))
    mb.buckets.values.flatten.foreach { rel =>
      assert(graft.sinks.BloomSidecar.exists(
        spark.sparkContext.hadoopConfiguration, s"$path/$rel", "id"),
        s"SET BLOOM missed $rel") }
    spark.sql(s"GRAFT VACUUM '$path' KEEP 1")
    assert(ManifestTable.versions(spark, path).size == 1,
      "SQL VACUUM KEEP 1 must retire older versions")
    // table still exact after the whole SQL-driven lifecycle
    val got = ManifestTable.read(spark, path)
      .groupBy().agg(count(lit(1)), sum("id")).head()
    assert(got.getLong(0) == 205L && got.getLong(1) == (0 until 200).map(_.toLong).sum + 5 * 999L)

    // DESCRIBE reports the vitals from one manifest read
    val d = spark.sql(s"GRAFT DESCRIBE '$path'").collect().head
    assert(d.getString(0) == path)
    assert(d.getString(2) == "8", "post-rebucket bucket count")
    assert(d.getString(4) == "205", "metadata row count")
    assert(d.getString(6).toInt > 0 && d.getString(7).toLong > 0,
      "file/byte totals from manifest lists")
    assert(d.getString(8) == "0" && d.getString(9) == "id")
    // metadata-only NDV from the manifest's HLL registers: 205 distinct
    // ids, ±6.5% RSE sketch
    val ndv = "id=(\\d+)".r.findFirstMatchIn(d.getString(10)).map(_.group(1).toInt)
    assert(ndv.exists(n => n >= 180 && n <= 230),
      s"DESCRIBE ndv must estimate ~205 distinct ids, got ${d.getString(10)}")
    assert(d.getString(11).toInt >= ManifestTable.CurrentWriterVersion,
      "DESCRIBE surfaces the writer feature level")
  }

  test("malformed GRAFT statements fail loudly; ordinary SQL is untouched") {
    intercept[Exception] { spark.sql("GRAFT OPTIMIZE missing_quotes") }
    val verbs = intercept[Exception] { spark.sql("GRAFT FROB '/x'") }
    // the verb list in the error stays current with the verb set
    Seq("OPTIMIZE", "VACUUM", "REBUCKET", "ADD COLUMNS", "DROP COLUMNS",
      "RENAME COLUMN", "SET BLOOM", "ANALYZE", "ADD CONSTRAINT",
      "DROP CONSTRAINT", "RESTORE", "DESCRIBE",
      "HISTORY", "VERIFY",
      "MAINTAIN", "CREATE TABLE", "CREATE AGG VIEW", "CREATE CHANGE FEED",
      "CREATE TEXT INDEX", "CREATE VECTOR INDEX",
      "REFRESH", "REBUILD").foreach(v =>
      assert(verbs.getMessage.contains(v),
        s"malformed-GRAFT error must list $v"))
    // rival layouts are a PARSE error, not a deep execution require:
    // no table at this path exists, so reaching execution would fail
    // differently — the message pins the parse-time refusal
    val rival = intercept[Exception] {
      spark.sql("GRAFT OPTIMIZE '/nope' CLUSTER BY a ZORDER BY (x, y)")
    }
    assert(rival.getMessage.contains("not both"))
    // the gate is a word boundary: identifiers STARTING with graft and
    // plain SQL still parse through Spark untouched
    assert(spark.sql("SELECT 1 AS graft_col").head().getInt(0) == 1)
    assert(spark.range(3).count() == 3)
  }

  test("CREATE TABLE: a SQL-born table takes the full write surface") {
    val path = tmp()
    spark.sql(s"GRAFT CREATE TABLE '$path' (id BIGINT, name STRING) " +
      "KEY id BUCKETS 4 BLOOM (id)")
    val m = ManifestTable.currentManifest(spark, path)
    assert(m.nBuckets == 4 && m.keyCol == "id" && m.bloomCols == Seq("id"))
    assert(ManifestTable.read(spark, path).isEmpty)
    // the SQL-born table is immediately a full citizen: INSERT, UPDATE
    val cat = ManifestIndexSource.CatalogName
    ManifestIndexSource.ensureRegistered(spark)
    spark.sql(s"INSERT INTO $cat.`$path` " +
      s"SELECT id, concat('n-', id) AS name, $cat.bucket(4, id) AS bucket " +
      "FROM range(10)")
    spark.sql(s"UPDATE $cat.`$path` SET name = 'up' WHERE id = 3")
    val got = ManifestTable.read(spark, path)
      .select("id", "name").as[(Long, String)].collect().toMap
    assert(got.size == 10 && got(3L) == "up" && got(7L) == "n-7")
    // refusals: duplicate create, reserved column, key not declared
    intercept[Exception] { spark.sql(
      s"GRAFT CREATE TABLE '$path' (id BIGINT) KEY id BUCKETS 2") }
    intercept[Exception] { spark.sql(
      s"GRAFT CREATE TABLE '${tmp()}' (id BIGINT, s STRING) KEY id BUCKETS 2") }
    intercept[Exception] { spark.sql(
      s"GRAFT CREATE TABLE '${tmp()}' (id BIGINT) KEY nope BUCKETS 2") }
  }

  test("CREATE AGG VIEW / REFRESH / REBUILD drive the materialized-view lifecycle from SQL") {
    val src = tmp(); val view = tmp()
    def rows(r: Range) = r.map(i => (i.toLong, s"c${i % 3}", i * 1.0))
      .toDF("id", "cat", "val")
    ManifestTable.write(rows(0 until 90), src, "id", 2)

    spark.sql(s"GRAFT CREATE AGG VIEW '$view' FROM '$src' " +
      "GROUP BY (cat) AGG (count, sum:val) BUCKETS 2")
    def viewState() = ManifestTable.read(spark, view)
      .select("cat", "count_all", "sum_val")
      .as[(String, Long, Double)].collect().toSet
    def recompute() = ManifestTable.read(spark, src)
      .groupBy("cat").agg(count(lit(1)), sum("val"))
      .as[(String, Long, Double)].collect().toSet
    assert(viewState() == recompute(), "SQL-created view == full recompute")

    // refresh folds only the delta; a current view reports refreshed=false
    ManifestTable.append(spark, src, rows(90 until 120), "id")
    val r1 = spark.sql(s"GRAFT REFRESH '$view'").collect().head
    assert(r1.getString(2) == "true" && viewState() == recompute())
    val r2 = spark.sql(s"GRAFT REFRESH '$view'").collect().head
    assert(r2.getString(2) == "false", "no-op refresh must report false")

    // non-append source change: REFRESH surfaces the rebuild demand;
    // REBUILD heals
    ManifestTable.upsert(spark, src,
      Seq((5L, "c0", 999.0)).toDF("id", "cat", "val"), "id")
    val e = intercept[IllegalStateException] {
      spark.sql(s"GRAFT REFRESH '$view'").collect() }
    assert(e.getMessage.contains("rebuild"))
    spark.sql(s"GRAFT REBUILD '$view'")
    assert(viewState() == recompute(), "SQL REBUILD must recompute exactly")

    // malformed agg specs are PARSE errors
    val bad = intercept[Exception] {
      spark.sql(s"GRAFT CREATE AGG VIEW '${tmp()}' FROM '$src' " +
        "GROUP BY (cat) AGG (median:val)") }
    assert(bad.getMessage.contains("malformed AGG entry"))
  }

  test("standard CREATE TABLE SQL: the bucket transform declares the layout") {
    val path = tmp()
    ManifestIndexSource.ensureRegistered(spark)
    val cat = ManifestIndexSource.CatalogName
    spark.sql(s"CREATE TABLE $cat.`$path` (id BIGINT, name STRING) " +
      "PARTITIONED BY (bucket(4, id)) TBLPROPERTIES ('bloom'='id')")
    val m = ManifestTable.currentManifest(spark, path)
    assert(m.nBuckets == 4 && m.keyCol == "id" && m.bloomCols == Seq("id"))
    spark.sql(s"INSERT INTO $cat.`$path` " +
      s"SELECT id, concat('n-', id), $cat.bucket(4, id) FROM range(8)")
    assert(ManifestTable.read(spark, path).count() == 8)
    intercept[Exception] { // double create refuses; nothing overwritten
      spark.sql(s"CREATE TABLE $cat.`$path` (id BIGINT) " +
        "PARTITIONED BY (bucket(2, id))")
    }
    assert(ManifestTable.read(spark, path).count() == 8)
    intercept[Exception] { // layout must be the bucket transform
      spark.sql(s"CREATE TABLE $cat.`${tmp()}` (id BIGINT, name STRING)")
    }
    // SHOW TBLPROPERTIES round-trips the DDL-configured bloom set
    val props = spark.sql(s"SHOW TBLPROPERTIES $cat.`$path`")
      .as[(String, String)].collect().toMap
    assert(props.get("bloom").contains("id") &&
      props.get("nBuckets").contains("4"), s"properties: $props")
    // CREATE OR REPLACE swaps layout and schema atomically-enough
    // (non-atomic drop+create — the catalog stages nothing)
    spark.sql(s"CREATE OR REPLACE TABLE $cat.`$path` " +
      "(k STRING, v DOUBLE) PARTITIONED BY (bucket(2, k))")
    val mr = ManifestTable.currentManifest(spark, path)
    assert(mr.nBuckets == 2 && mr.keyCol == "k" &&
      ManifestTable.read(spark, path).isEmpty, "replaced table")
    // DROP TABLE deletes the path — CREATE/ALTER/DROP all standard
    spark.sql(s"DROP TABLE $cat.`$path`")
    assert(ManifestTable.headVersion(spark, path).isEmpty, "dropped")
    assert(!new java.io.File(path).exists, "directory must be gone")
    intercept[Exception] { spark.sql(s"DROP TABLE $cat.`$path`") }
    spark.sql(s"DROP TABLE IF EXISTS $cat.`$path`") // no-op, no error
  }

  test("RESTORE rolls back to a version's exact state in one pointer-only commit") {
    val path = tmp()
    ManifestTable.write(
      (0 until 50).map(i => (i.toLong, s"n-$i")).toDF("id", "name"),
      path, "id", 2)                                              // v1
    val v1 = ManifestTable.currentManifest(spark, path).version
    ManifestTable.upsert(spark, path,
      Seq((3L, "broken")).toDF("id", "name"), "id")               // v2
    ManifestTable.deleteKeys(spark, path, Seq(7L).toDF("id"), "id") // v3
    ManifestTable.appendOnce(spark, path,
      Seq((900L, "w")).toDF("id", "name"), "id", "rst-app", 5L)   // v4

    spark.sql(s"GRAFT RESTORE '$path' TO VERSION $v1")
    val m = ManifestTable.currentManifest(spark, path)
    assert(m.version == v1 + 4, "restore is a NEW commit, not history surgery")
    assert(m.buckets == ManifestTable.readManifest(spark, path, v1).buckets,
      "pointer state must equal the restore target's")
    val got = ManifestTable.read(spark, path)
      .select("id", "name").as[(Long, String)].collect().toMap
    assert(got.size == 50 && got(3L) == "n-3" && got.contains(7L) &&
      !got.contains(900L), "contents must be v1's exactly")
    // interim versions remain time-travel readable
    assert(ManifestTable.readVersion(spark, path, v1 + 3).count() == 50)
    // txn watermarks survive the rollback: a replayed exactly-once
    // batch must NOT re-apply just because data was rolled back
    assert(!ManifestTable.appendOnce(spark, path,
      Seq((900L, "w")).toDF("id", "name"), "id", "rst-app", 5L),
      "watermark must survive restore")
    // HISTORY recognizes the restore from metadata alone (state equals
    // an older retained version's) while the target survives vacuum
    val ops = spark.sql(s"GRAFT HISTORY '$path'")
      .select("version", "operation").as[(String, String)].collect().toMap
    assert(ops((v1 + 4).toString) == "restore")
    // TO TIMESTAMP resolves with the TIMESTAMP AS OF rule: just before
    // the restore commit's wall-clock lands on the pre-restore head
    val preRestoreTs = ManifestTable.manifestModTime(spark, path, v1 + 4) - 1
    spark.sql(s"GRAFT RESTORE '$path' TO TIMESTAMP " +
      s"'${new java.sql.Timestamp(preRestoreTs)}'")
    val afterTs = ManifestTable.read(spark, path)
      .select("id", "name").as[(Long, String)].collect().toMap
    assert(afterTs.size == 50 && afterTs(3L) == "broken" &&
      !afterTs.contains(7L) && afterTs.contains(900L),
      "TO TIMESTAMP must land on v4's (pre-restore) state")
    // a timestamp before every retained commit refuses loudly
    intercept[Exception] {
      spark.sql(s"GRAFT RESTORE '$path' TO TIMESTAMP '1999-01-01 00:00:00'")
    }
    // put v1's state back for the vacuum stanza below
    spark.sql(s"GRAFT RESTORE '$path' TO VERSION $v1")
    // restoring a vacuumed version fails loudly
    ManifestTable.vacuum(spark, path, keepVersions = 1)
    intercept[Exception] { spark.sql(s"GRAFT RESTORE '$path' TO VERSION $v1") }
  }

  test("RENAME COLUMN: one honest rewrite; key and bloom follow; guards hold") {
    val path = tmp()
    ManifestTable.write(
      (0 until 40).map(i => (i.toLong, s"n-$i", i * 1.0))
        .toDF("id", "name", "score"),
      path, "id", 2)
    spark.sql(s"GRAFT SET BLOOM '$path' (id)")
    ManifestTable.deleteKeys(spark, path, Seq(5L).toDF("id"), "id")
    spark.sql(s"GRAFT RENAME COLUMN '$path' id TO ident")
    val m = ManifestTable.currentManifest(spark, path)
    assert(m.keyCol == "ident" && m.bloomCols == Seq("ident"),
      "key and bloom columns must follow the rename")
    assert(m.schema.fieldNames.toSeq ==
      Seq("ident", "name", "score", "bucket"))
    intercept[Exception] {
      spark.sql(s"GRAFT RENAME COLUMN '$path' bucket TO b2")
    }
    assert(m.tombstones.valuesIterator.forall(_.isEmpty),
      "the rewrite folds live tombstones away")
    val got = ManifestTable.read(spark, path)
      .select("ident", "name").as[(Long, String)].collect().toMap
    assert(got.size == 39 && !got.contains(5L) && got(3L) == "n-3")
    // keyed writes address the NEW name; HISTORY classifies the rename
    ManifestTable.upsert(spark, path,
      Seq((3L, "up", 0.0)).toDF("ident", "name", "score"), "ident")
    assert(ManifestTable.read(spark, path).filter(col("ident") === 3L)
      .select("name").as[String].head() == "up")
    val ops = spark.sql(s"GRAFT HISTORY '$path'")
      .select("version", "operation").as[(String, String)].collect().toMap
    assert(ops(m.version.toString) == "rename_column",
      s"history must classify the rename, got: $ops")
    // guards: unknown source, occupied target, reserved name, and the
    // resurrection guard on renaming ONTO a previously dropped name
    intercept[Exception] { spark.sql(s"GRAFT RENAME COLUMN '$path' nope TO x") }
    intercept[Exception] { spark.sql(s"GRAFT RENAME COLUMN '$path' name TO score") }
    intercept[Exception] { spark.sql(s"GRAFT RENAME COLUMN '$path' name TO bucket") }
    ManifestTable.dropColumns(spark, path, Seq("score"))
    intercept[Exception] { spark.sql(s"GRAFT RENAME COLUMN '$path' name TO score") }
  }

  test("HISTORY classifies each retained version from metadata alone") {
    val path = tmp()
    ManifestTable.write(
      (0 until 40).map(i => (i.toLong, s"n-$i")).toDF("id", "name"),
      path, "id", 2)                                               // v1 baseline
    ManifestTable.append(spark, path,
      Seq((100L, "a")).toDF("id", "name"), "id")                   // v2 append
    ManifestTable.deleteKeys(spark, path, Seq(3L).toDF("id"), "id") // v3 delete
    ManifestTable.upsert(spark, path,
      Seq((5L, "u")).toDF("id", "name"), "id")                     // v4 rewrite
    ManifestTable.merge(spark, path,
      Seq((6L, "m"), (200L, "m2")).toDF("id", "name"), "id")       // v5 merge
    ManifestTable.addColumns(spark, path, "tag STRING")            // v6 evolve
    ManifestTable.rebucket(spark, path, 4)                         // v7 rebucket

    val h = spark.sql(s"GRAFT HISTORY '$path'").collect()
      .map(r => (r.getString(0).toInt, r.getString(2)))
    assert(h.head._1 == 7, "newest first")
    assert(h.toSeq == Seq(7 -> "rebucket", 6 -> "add_columns",
      5 -> "merge", 4 -> "rewrite", 3 -> "delete", 2 -> "append",
      1 -> "baseline"), s"got ${h.toSeq}")
    // LIMIT and the tombstone-delta column
    assert(spark.sql(s"GRAFT HISTORY '$path' LIMIT 2").collect().length == 2)
    val del = spark.sql(s"GRAFT HISTORY '$path'").collect()
      .find(_.getString(0) == "3").get
    assert(del.getString(5) == "1", "v3 added one tombstone entry")
    // vacuumed versions are simply absent
    ManifestTable.vacuum(spark, path, keepVersions = 2)
    val after = spark.sql(s"GRAFT HISTORY '$path'").collect()
      .map(_.getString(0).toInt).toSeq
    assert(after == Seq(7, 6), s"retention view: $after")
  }

  test("HISTORY LIMIT bounds metadata reads to the window, not the log depth") {
    val path = tmp()
    ManifestTable.write(
      (0 until 10).map(i => (i.toLong, s"n-$i")).toDF("id", "name"),
      path, "id", 2)
    // a deep history...
    (0 until 20).foreach(i => ManifestTable.append(spark, path,
      Seq((100L + i, s"a-$i")).toDF("id", "name"), "id"))
    // ...whose newest commits are metadata-only (no pointer movement →
    // the restore look-back never fires): LIMIT k must read the k
    // window manifests plus one predecessor each (memoized → k+1),
    // NEVER the whole log
    ManifestTable.setBloomColumns(spark, path, Seq("name"))
    ManifestTable.setBloomColumns(spark, path, Seq.empty)
    ManifestTable.setBloomColumns(spark, path, Seq("name"))
    val before = ManifestTable.manifestReads.get()
    val rows = spark.sql(s"GRAFT HISTORY '$path' LIMIT 3").collect()
    val delta = ManifestTable.manifestReads.get() - before
    assert(rows.length == 3 && rows.forall(_.getString(2) == "metadata"),
      s"got ${rows.map(_.getString(2)).toSeq}")
    assert(delta <= 6,
      s"HISTORY LIMIT 3 on a 24-deep log must read ~4 manifests, read $delta")
  }

  test("AutoMaintain: the commit stream drives upkeep to a healthy fixpoint") {
    val path = tmp()
    ManifestTable.write(
      (0 until 100).map(i => (i.toLong, s"n-$i")).toDF("id", "name"),
      path, "id", 2)
    // fragment + tombstone + history: all three conditions planted
    (0 until 12).foreach(i => ManifestTable.append(spark, path,
      Seq((1000L + i, s"a-$i")).toDF("id", "name"), "id"))
    ManifestTable.deleteKeys(spark, path, Seq(2L).toDF("id"), "id")
    assert(ManifestTable.maintenanceAdvice(spark, path).nonEmpty)

    val ckpt = s"${Files.createTempDirectory("graft-am")}/ckpt"
    graft.streaming.AutoMaintain.start(spark, path, ckpt,
        trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .awaitTermination(180000)
    val m = ManifestTable.currentManifest(spark, path)
    assert(m.buckets.values.forall(_.size == 1) && m.tombstones.isEmpty,
      "auto-maintain must bin-pack and fold tombstones")
    assert(ManifestTable.maintenanceAdvice(spark, path).isEmpty,
      "fixpoint: post-maintain vitals healthy")
    // contents exact through the hands-off cycle
    assert(ManifestTable.read(spark, path).count() == 100 + 12 - 1)
    // a second drain over a fresh checkpoint does nothing (fixpoint)
    val v = ManifestTable.currentManifest(spark, path).version
    graft.streaming.AutoMaintain.start(spark, path,
        s"${Files.createTempDirectory("graft-am")}/ckpt2",
        trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .awaitTermination(180000)
    assert(ManifestTable.currentManifest(spark, path).version == v,
      "healthy vitals must not re-commit")
  }

  test("MAINTAIN: each planted condition is advised, then healed by the advised run") {
    val path = tmp()
    ManifestTable.write(
      (0 until 200).map(i => (i.toLong, s"n-$i")).toDF("id", "name"),
      path, "id", 2)
    // healthy table: one explicit none row
    val healthy = spark.sql(s"GRAFT MAINTAIN '$path'").collect()
    assert(healthy.map(_.getString(1)).toSeq == Seq("none"))

    // plant all three conditions: small files (12 appends fragment the
    // buckets far past what their bytes need), merge-on-read tombstones,
    // and history depth (every commit above is a version)
    (0 until 12).foreach(i => ManifestTable.append(spark, path,
      Seq((1000L + i, s"a-$i")).toDF("id", "name"), "id"))
    ManifestTable.deleteKeys(spark, path, Seq(3L, 5L).toDF("id"), "id")
    val planted = ManifestTable.maintenanceAdvice(spark, path)
    assert(planted.exists(a => a.action == "optimize" &&
      a.reason.contains("files")), s"small-file advice missing: $planted")
    assert(planted.exists(a => a.action == "optimize" &&
      a.reason.contains("tombstone")), s"tombstone advice missing: $planted")
    assert(planted.exists(_.action == "vacuum"),
      s"history-depth advice missing: $planted")

    // DRY reports without executing
    val preV = ManifestTable.currentManifest(spark, path).version
    val dry = spark.sql(s"GRAFT MAINTAIN '$path' DRY").collect()
    assert(dry.forall(_.getString(3) == "false"))
    assert(ManifestTable.currentManifest(spark, path).version == preV,
      "DRY must not commit")

    // the real run executes the advised set and heals every condition
    val ran = spark.sql(s"GRAFT MAINTAIN '$path'").collect()
    assert(ran.map(_.getString(1)).toSet == Set("optimize", "vacuum"))
    assert(ran.forall(_.getString(3) == "true"))
    val m = ManifestTable.currentManifest(spark, path)
    assert(m.buckets.values.forall(_.size == 1), "optimize must bin-pack")
    assert(m.tombstones.isEmpty, "optimize must fold tombstones")
    assert(ManifestTable.versions(spark, path).size <= 2,
      "vacuum must trim history")
    assert(ManifestTable.maintenanceAdvice(spark, path).isEmpty,
      "post-maintain vitals must be healthy")
    // contents exact through the whole cycle
    val got = ManifestTable.read(spark, path)
      .agg(count(lit(1)), sum("id")).head()
    assert(got.getLong(0) == 210L,
      s"200 - 2 deleted + 12 appended rows, got ${got.getLong(0)}")
  }

  test("DROP TABLE / DROP INDEX delete their targets; type checks refuse a mixed-up verb") {
    import graft.ops.Bm25Index
    // a real table drops cleanly and the path is reusable
    val path = tmp()
    ManifestTable.write(Seq((1L, "a"), (2L, "b")).toDF("id", "name"),
      path, "id", 2)
    val r = spark.sql(s"GRAFT DROP TABLE '$path'").collect().head
    assert(r.getString(1) == "drop_table" && r.getString(2) == "true")
    assert(!new java.io.File(path).exists(), "table dir must be gone")
    assert(ManifestTable.headVersion(spark, path).isEmpty)
    spark.sql(s"GRAFT CREATE TABLE '$path' (id BIGINT, name STRING) " +
      "KEY id BUCKETS 2").collect()
    assert(ManifestTable.headVersion(spark, path).nonEmpty,
      "dropped path must be re-creatable")

    // an index drops through DROP INDEX — and only through it
    val corpus = tmp(); val idx = tmp()
    ManifestTable.write((0L until 10L).map(i => (i, s"alpha w$i"))
      .toDF("doc_id", "text"), corpus, "doc_id", 2)
    Bm25Index.sync(spark, idx, corpus, "doc_id", "text", nBuckets = 2)
    val wrongVerb = intercept[Exception] {
      spark.sql(s"GRAFT DROP TABLE '$idx'").collect()
    }
    assert(wrongVerb.getMessage.contains("DROP INDEX"),
      s"table verb on an index must point at DROP INDEX: ${wrongVerb.getMessage}")
    val wrongVerb2 = intercept[Exception] {
      spark.sql(s"GRAFT DROP INDEX '$corpus'").collect()
    }
    assert(wrongVerb2.getMessage.contains("DROP TABLE"),
      s"index verb on a table must point at DROP TABLE: ${wrongVerb2.getMessage}")
    // index INTERNALS are real manifest tables with no def of their own
    // — DROP TABLE on '<idx>/postings' must refuse and point at the
    // index root, not gut a live index (ADVICE r15)
    val gut = intercept[Exception] {
      spark.sql(s"GRAFT DROP TABLE '$idx/postings'").collect()
    }
    assert(gut.getMessage.contains("internal to the search index") &&
      gut.getMessage.contains(s"GRAFT DROP INDEX"),
      s"index-internal drop must refuse and redirect: ${gut.getMessage}")
    assert(ManifestTable.headVersion(spark, s"$idx/postings").nonEmpty,
      "a refused internal drop must leave the postings intact")
    assert(spark.sql(s"GRAFT SEARCH TEXT '$idx' TERMS ('alpha') TOP 3")
      .count() > 0, "index must still answer after the refused drop")
    assert(spark.sql(s"GRAFT DROP INDEX '$idx'").collect()
      .head.getString(1) == "drop_index")
    assert(!new java.io.File(idx).exists(), "index dir must be gone")
    // the corpus the index was built over is untouched
    assert(ManifestTable.read(spark, corpus).count() == 10L)

    // neither verb touches a path that is neither table nor index
    val stray = s"${Files.createTempDirectory("graft-sql-stray")}"
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(stray, "precious.txt"), "do not delete")
    val refuse = intercept[Exception] {
      spark.sql(s"GRAFT DROP TABLE '$stray'").collect()
    }
    assert(refuse.getMessage.contains("no manifest table"))
    assert(new java.io.File(s"$stray/precious.txt").exists(),
      "a refused drop must leave the path untouched")
    intercept[Exception] {
      spark.sql("GRAFT DROP TABLE '/tmp/graft-definitely-missing'").collect()
    }
  }
}
