package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sinks.ManifestTable
import graft.sources.ManifestIndexSource

/** ADD COLUMNS is a metadata-only commit: no file is rewritten, old
  * files read as NULL for the new columns on EVERY path (v1 parquet,
  * DSv2 vectorized, keyed lookup), new writes carry them, rewrites
  * materialize the nulls, and time travel still shows the pre-evolution
  * schema. Refusals (duplicate names, unreadable types) must not
  * commit.
  */
class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = s"${Files.createTempDirectory("graft-evo")}/tbl"

  test("old files null-fill, new writes carry the columns, every read path agrees") {
    val path = tmp()
    ManifestTable.write(
      (0 until 40).map(i => (i.toLong, s"n-$i")).toDF("id", "name"), path, "id", 2)
    ManifestTable.append(spark, path,
      (40 until 60).map(i => (i.toLong, s"n-$i")).toDF("id", "name"), "id")
    val preV = ManifestTable.versions(spark, path).last

    ManifestTable.addColumns(spark, path, "score DOUBLE, tag STRING")
    // metadata-only: same data dirs, one more version
    val m = ManifestTable.currentManifest(spark, path)
    assert(m.version == preV + 1)
    assert(m.buckets == ManifestTable.readManifest(spark, path, preV).buckets,
      "addColumns must not touch data pointers")
    assert(m.schema.fieldNames.toSeq.containsSlice(Seq("score", "tag")))

    // old rows: nulls on both v1 and DSv2 paths
    val v1 = ManifestTable.read(spark, path)
    assert(v1.schema.fieldNames.contains("score"))
    assert(v1.filter(col("score").isNotNull).count() == 0)
    val v2 = ManifestIndexSource.read(spark, path)
    assert(v2.filter(col("tag").isNotNull).count() == 0)
    assert(v2.count() == 60)

    // new-schema append mixes with old dirs; every path agrees
    ManifestTable.append(spark, path,
      (60 until 70).map(i => (i.toLong, s"n-$i", i * 1.0, s"t-$i"))
        .toDF("id", "name", "score", "tag"), "id")
    val got = ManifestTable.read(spark, path)
      .select("id", "name", "score", "tag")
      .as[(Long, String, Option[Double], Option[String])].collect().toSet
    val want = ((0 until 60).map(i => (i.toLong, s"n-$i",
        None: Option[Double], None: Option[String])) ++
      (60 until 70).map(i => (i.toLong, s"n-$i", Some(i * 1.0), Some(s"t-$i")))).toSet
    assert(got == want, "mixed-schema read wrong")
    assert(ManifestIndexSource.read(spark, path)
      .select("id", "name", "score", "tag")
      .as[(Long, String, Option[Double], Option[String])].collect().toSet == want,
      "DSv2 mixed-schema read wrong")
    // keyed lookups across the boundary
    assert(ManifestTable.lookup(spark, path, "id", 5L)
      .select("name", "score").as[(String, Option[Double])].collect().toSeq ==
      Seq(("n-5", None)))
    assert(ManifestTable.lookup(spark, path, "id", 65L)
      .select("name", "score").as[(String, Option[Double])].collect().toSeq ==
      Seq(("n-65", Some(65.0))))

    // predicates on the new column: old dirs have no bounds and must
    // conservatively survive; answers exact through SQL
    ManifestIndexSource.ensureRegistered(spark)
    val n = spark.sql(
      s"SELECT count(*) FROM graft_manifest.`$path` WHERE score > 64.5")
      .head().getLong(0)
    assert(n == 5L, s"new-column predicate wrong: $n")

    // time travel: the pre-evolution version keeps its schema
    val old = ManifestTable.readVersion(spark, path, preV)
    assert(!old.schema.fieldNames.contains("score"))
    assert(old.count() == 60)
  }

  test("rewrites materialize the nulls; refusals do not commit") {
    val path = tmp()
    ManifestTable.write(
      (0 until 20).map(i => (i.toLong, s"n-$i")).toDF("id", "name"), path, "id", 2)
    ManifestTable.addColumns(spark, path, "score DOUBLE")
    // an upsert rewrite physically writes the evolved schema
    ManifestTable.upsert(spark, path,
      Seq((1L, "u-1", 9.0)).toDF("id", "name", "score"), "id")
    val m = ManifestTable.currentManifest(spark, path)
    val touched = {
      val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
        org.apache.spark.sql.catalyst.expressions.Literal(1L).value,
        org.apache.spark.sql.types.LongType, 42L)
      (((h % 2) + 2) % 2).toInt
    }
    val rewritten = new java.io.File(s"$path/${m.buckets(touched).head}")
      .listFiles().filter(_.getName.endsWith(".parquet")).head
    val fr = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(rewritten.getAbsolutePath),
        spark.sparkContext.hadoopConfiguration))
    try assert(fr.getFooter.getFileMetaData.getSchema.containsField("score"),
      "rewrite must materialize the evolved column")
    finally fr.close()
    val hit = ManifestTable.lookup(spark, path, "id", 1L)
      .select("name", "score").as[(String, Double)].collect().toSeq
    assert(hit == Seq(("u-1", 9.0)))

    val v = ManifestTable.currentManifest(spark, path).version
    intercept[IllegalArgumentException] {
      ManifestTable.addColumns(spark, path, "name STRING") } // duplicate
    intercept[IllegalArgumentException] {
      ManifestTable.addColumns(spark, path, "m MAP<STRING, STRING>") } // unreadable
    // reserved staging names: 'b'/'s' are consumed by partitionBy on
    // the next rewrite (data silently nulled), 'bucket' is the derived
    // layout column — all refused, case-insensitively (ADVICE r10)
    Seq("b INT", "s STRING", "B DOUBLE", "S INT", "BUCKET INT").foreach(d =>
      intercept[IllegalArgumentException] {
        ManifestTable.addColumns(spark, path, d) })
    assert(ManifestTable.currentManifest(spark, path).version == v,
      "refused evolution must not commit")
    // the same reservation guards the initial write
    intercept[IllegalArgumentException] {
      ManifestTable.write(Seq((1L, 2)).toDF("id", "s"), tmp(), "id", 2) }
  }

  test("DROP COLUMNS is metadata-only; the name is buried against resurrection") {
    val path = tmp()
    ManifestTable.write(
      (0 until 30).map(i => (i.toLong, s"n-$i", i * 1.0))
        .toDF("id", "name", "score"), path, "id", 2,
      bloomCols = Seq("id"))
    val preV = ManifestTable.currentManifest(spark, path).version

    spark.sql(s"GRAFT DROP COLUMNS '$path' (score)")
    val m = ManifestTable.currentManifest(spark, path)
    assert(m.version == preV + 1 &&
      !m.schema.fieldNames.contains("score") &&
      m.buckets == ManifestTable.readManifest(spark, path, preV).buckets,
      "drop must be a metadata-only commit")

    // every read path projects the narrower schema; data intact
    val v1 = ManifestTable.read(spark, path)
    assert(!v1.schema.fieldNames.contains("score") && v1.count() == 30)
    val v2 = ManifestIndexSource.read(spark, path)
    assert(!v2.schema.fieldNames.contains("score"))
    assert(v2.filter(col("id") === 3).select("name")
      .as[String].head() == "n-3")
    // time travel still shows the dropped column with its data
    assert(ManifestTable.readVersion(spark, path, preV)
      .filter(col("id") === 3).select("score").as[Double].head() == 3.0)

    // rewrites materialize the narrower schema
    ManifestTable.upsert(spark, path,
      Seq((3L, "u-3")).toDF("id", "name"), "id")
    assert(ManifestTable.lookup(spark, path, "id", 3L)
      .select("name").as[String].head() == "u-3")

    // refusals: key, bucket, bloom-carrying, unknown — and the buried
    // name cannot come back (old files would resurrect dropped data)
    intercept[IllegalArgumentException] {
      ManifestTable.dropColumns(spark, path, Seq("id")) }
    intercept[IllegalArgumentException] {
      ManifestTable.dropColumns(spark, path, Seq("bucket")) }
    intercept[IllegalArgumentException] {
      ManifestTable.dropColumns(spark, path, Seq("nope")) }
    intercept[IllegalArgumentException] {
      ManifestTable.addColumns(spark, path, "score DOUBLE") }
    intercept[IllegalArgumentException] {
      ManifestTable.addColumns(spark, path, "SCORE STRING") } // case too
    // a bloom column refuses until its sidecar registration is removed
    val p2 = tmp()
    ManifestTable.write(
      (0 until 10).map(i => (i.toLong, s"h-$i")).toDF("id", "tag"),
      p2, "id", 2, bloomCols = Seq("id", "tag"))
    intercept[IllegalArgumentException] {
      ManifestTable.dropColumns(spark, p2, Seq("tag")) }
    ManifestTable.setBloomColumns(spark, p2, Seq("id"))
    ManifestTable.dropColumns(spark, p2, Seq("tag"))
    assert(!ManifestTable.currentManifest(spark, p2)
      .schema.fieldNames.contains("tag"))
    // the burial lifts at the next FULL rewrite: no referenced file
    // carries the name afterwards, so re-adding it is safe — and the
    // re-added column reads as fresh nulls, never as the old data
    intercept[IllegalArgumentException] {
      ManifestTable.addColumns(spark, p2, "tag STRING") }
    ManifestTable.rebucket(spark, p2, 3)
    assert(ManifestTable.currentManifest(spark, p2).droppedCols.isEmpty)
    ManifestTable.addColumns(spark, p2, "tag STRING")
    assert(ManifestTable.read(spark, p2).filter(col("tag").isNotNull).count() == 0,
      "a re-added name must never resurrect dropped data")
  }

  test("standard ALTER TABLE SQL drives the evolution API through the catalog") {
    val path = tmp()
    ManifestTable.write(
      (0 until 30).map(i => (i.toLong, s"n-$i")).toDF("id", "name"),
      path, "id", 2)
    ManifestIndexSource.ensureRegistered(spark)
    val t = s"${ManifestIndexSource.CatalogName}.`$path`"

    // ADD COLUMNS: one metadata-only commit for the whole statement
    val preV = ManifestTable.versions(spark, path).last
    spark.sql(s"ALTER TABLE $t ADD COLUMNS (score DOUBLE, tag STRING)")
    val m1 = ManifestTable.currentManifest(spark, path)
    assert(m1.version == preV + 1, "one commit per ALTER statement")
    assert(m1.schema.fieldNames.toSeq.containsSlice(Seq("score", "tag")))
    assert(m1.buckets == ManifestTable.readManifest(spark, path, preV).buckets,
      "ADD COLUMNS stays metadata-only")

    // RENAME COLUMN: the honest rewrite, key follows
    spark.sql(s"ALTER TABLE $t RENAME COLUMN id TO ident")
    val m2 = ManifestTable.currentManifest(spark, path)
    assert(m2.keyCol == "ident")
    assert(spark.sql(s"SELECT ident, name FROM $t WHERE ident = 3")
      .collect().head.getString(1) == "n-3")

    // DROP COLUMN: metadata-only, name buried
    spark.sql(s"ALTER TABLE $t DROP COLUMN tag")
    val m3 = ManifestTable.currentManifest(spark, path)
    assert(!m3.schema.fieldNames.contains("tag") &&
      m3.droppedCols.exists(_.equalsIgnoreCase("tag")))

    // bloom columns ride TBLPROPERTIES, matching CREATE TABLE's form
    spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES ('bloom'='ident')")
    assert(ManifestTable.currentManifest(spark, path).bloomCols == Seq("ident"))
    spark.sql(s"ALTER TABLE $t UNSET TBLPROPERTIES ('bloom')")
    assert(ManifestTable.currentManifest(spark, path).bloomCols.isEmpty)

    // out-of-surface changes refuse loudly, committing nothing
    val v = ManifestTable.versions(spark, path).last
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $t ALTER COLUMN score TYPE STRING")
    }
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $t ADD COLUMNS (late INT FIRST)")
    }
    intercept[Exception] { // silent-null contract violation refused
      spark.sql(s"ALTER TABLE $t ADD COLUMNS (strict INT NOT NULL)")
    }
    intercept[Exception] { // mixed statement: refused part poisons ALL
      spark.sql(
        s"ALTER TABLE $t SET TBLPROPERTIES ('bloom'='ident','owner'='x')")
    }
    assert(ManifestTable.versions(spark, path).last == v,
      "refused ALTERs must not commit — not even their supported parts")
    assert(ManifestTable.currentManifest(spark, path).bloomCols.isEmpty,
      "the mixed statement's bloom half must not have applied")
    // a metadata toggle reproducing an older state is NOT a restore
    spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES ('bloom'='ident')")
    spark.sql(s"ALTER TABLE $t UNSET TBLPROPERTIES ('bloom')")
    val ops = spark.sql(s"GRAFT HISTORY '$path' LIMIT 1")
      .select("operation").as[String].collect()
    assert(ops.head == "metadata",
      s"bloom toggle must classify metadata, got ${ops.head}")
  }

  test("ALTER eligibility validates ALL changes before applying ANY") {
    val path = tmp()
    ManifestTable.write(
      (0 until 20).map(i => (i.toLong, s"n-$i", i * 1.0, s"t-$i"))
        .toDF("id", "name", "score", "tag"),
      path, "id", 2)
    ManifestIndexSource.ensureRegistered(spark)
    val t = s"${ManifestIndexSource.CatalogName}.`$path`"

    // a statement mixing an eligible drop with the KEY column must
    // refuse with NOTHING applied — not drop `score` and then die
    val v0 = ManifestTable.versions(spark, path).last
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $t DROP COLUMNS (score, id)")
    }
    val m0 = ManifestTable.currentManifest(spark, path)
    assert(m0.version == v0, "half-applied DROP COLUMNS must not commit")
    assert(m0.schema.fieldNames.contains("score"),
      "the eligible half of a refused statement must not apply")

    // same through the catalog API with MIXED change kinds: the add
    // would be applied first in statement order — an ineligible drop
    // later in the statement must prevent it
    val catalog = spark.sessionState.catalogManager
      .catalog(ManifestIndexSource.CatalogName)
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
    val ident = org.apache.spark.sql.connector.catalog.Identifier
      .of(Array.empty, path)
    import org.apache.spark.sql.connector.catalog.TableChange
    intercept[Exception] {
      catalog.alterTable(ident,
        TableChange.addColumn(Array("fresh"),
          org.apache.spark.sql.types.IntegerType),
        TableChange.deleteColumn(Array("id"), false))
    }
    val m1 = ManifestTable.currentManifest(spark, path)
    assert(m1.version == v0 && !m1.schema.fieldNames.contains("fresh"),
      "an ineligible change later in the statement must poison the adds")

    // an ineligible drop of a bloom-carrying column refuses the batch
    spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES ('bloom'='name')")
    val v1 = ManifestTable.versions(spark, path).last
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $t DROP COLUMNS (tag, name)")
    }
    val m2 = ManifestTable.currentManifest(spark, path)
    assert(m2.version == v1 && m2.schema.fieldNames.contains("tag"),
      "bloom-carrying drop must poison the whole statement")

    // an eligible multi-drop lands as ONE commit
    spark.sql(s"ALTER TABLE $t DROP COLUMNS (score, tag)")
    val m3 = ManifestTable.currentManifest(spark, path)
    assert(m3.version == v1 + 1, "grouped drops: one commit per statement")
    assert(!m3.schema.fieldNames.contains("score") &&
      !m3.schema.fieldNames.contains("tag"))
  }

  test("the key's NOT NULL read claim is gated on the writer feature level") {
    val path = tmp()
    ManifestTable.write(
      (0 until 10).map(i => (i.toLong, s"n-$i")).toDF("id", "name"),
      path, "id", 2)
    ManifestIndexSource.ensureRegistered(spark)
    val t = s"${ManifestIndexSource.CatalogName}.`$path`"
    def keyNullable(): Boolean =
      spark.table(t).schema("id").nullable

    // guard-era table: the write path enforced non-null keys, so the
    // DSv2 schema may claim NOT NULL
    assert(ManifestTable.currentManifest(spark, path).writerVersion >=
      ManifestTable.CurrentWriterVersion)
    assert(!keyNullable(), "guard-era key must read NOT NULL")

    // a manifest without the feature level (written before the guard)
    // parses to level 0
    assert(ManifestTable.parseForTest(
      """{"version":1,"nBuckets":2,"keyCol":"id","schemaDdl":"id BIGINT",""" +
        """"buckets":{}}""").writerVersion == 0)

    // simulate a pre-guard table: commit a level-0 manifest (what an
    // old writer would have published) — the key must fall back to
    // nullable, because old dirs could hold null keys the guard never
    // saw (xxhash64(null) hashes to the seed, so they bucketed fine)
    val cur = ManifestTable.currentManifest(spark, path)
    ManifestTable.publish(spark, path,
      cur.copy(version = cur.version + 1, writerVersion = 0))
    assert(keyNullable(), "pre-guard manifests must not claim NOT NULL")

    // a FULL rewrite passes every row back through the guard and
    // upgrades the level: the claim returns
    ManifestTable.rebucket(spark, path, 4)
    assert(ManifestTable.currentManifest(spark, path).writerVersion >=
      ManifestTable.CurrentWriterVersion)
    assert(!keyNullable(), "full rewrite re-certifies NOT NULL")
    // ...and ordinary commits PRESERVE the level
    import spark.implicits._
    ManifestTable.append(spark, path,
      Seq((100L, "a")).toDF("id", "name"), "id")
    assert(!keyNullable(), "appends preserve the feature level")
  }
}
