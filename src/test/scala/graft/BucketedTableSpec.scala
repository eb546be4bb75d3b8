package graft

import java.nio.file.Files
import org.apache.spark.sql.functions.lit
import graft.sinks.BucketedTable

/** Copy-on-write semantics AND IO scope of the bucketed keyed table:
  * correctness of merge/update/delete, plus the property that makes it
  * the S7/S8 scale path — maintenance touches ONLY the buckets holding
  * the touched keys (asserted on the actual bucket directories).
  */
class BucketedTableSpec extends SparkSpec {
  import spark.implicits._

  private def filesOf(path: String, b: Int): Set[String] = {
    val d = new java.io.File(s"$path/bucket=$b")
    if (d.exists) d.listFiles.map(_.getName).filter(_.endsWith(".parquet")).toSet
    else Set.empty
  }

  test("upsert/update/delete rewrite only the touched buckets; lookup prunes to one") {
    val base = Files.createTempDirectory("graft-bucketed").toString
    val path = s"$base/tbl"
    val nB = 8
    val df = (0L until 100L).map(i => (i, s"name-$i", i * 10.0))
      .toDF("id", "name", "score")
    BucketedTable.write(df, path, "id", nB)
    val before = (0 until nB).map(b => b -> filesOf(path, b)).toMap

    // merge: one key updated, one inserted
    val ups = Seq((3L, "updated-3", 999.0), (200L, "new-200", 1.0))
      .toDF("id", "name", "score")
    BucketedTable.upsert(spark, path, ups, "id", nB)
    val after = (0 until nB).map(b => b -> filesOf(path, b)).toMap
    val rewritten = (0 until nB).filter(b => before(b) != after(b))
    assert(rewritten.size <= 2,
      s"upsert of 2 keys rewrote buckets $rewritten — IO not bounded by touched keys")

    val all = BucketedTable.read(spark, path)
    assert(all.count() == 101)
    assert(all.filter($"id" === 3L).select("name").as[String].head() == "updated-3")
    assert(all.filter($"id" === 200L).count() == 1)
    assert(all.filter($"id" === 5L).select("name").as[String].head() == "name-5")

    // keyed column update (S7)
    BucketedTable.update(spark, path, "id", 7L, Map("score" -> lit(-1.0)), nB)
    assert(BucketedTable.read(spark, path)
      .filter($"id" === 7L).select("score").as[Double].head() == -1.0)

    // point lookup prunes to the key's single bucket directory
    val lk = BucketedTable.lookup(spark, path, "id", 42L, nB)
    assert(lk.select("name").as[String].head() == "name-42")
    val plan = lk.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(bucket"), plan.take(600))

    // keyed delete (S8)
    BucketedTable.delete(spark, path, "id", 3L, nB)
    val left = BucketedTable.read(spark, path)
    assert(left.filter($"id" === 3L).count() == 0 && left.count() == 100)
  }

  test("model check (seeded): random upsert/delete sequence matches a Map model") {
    val base = Files.createTempDirectory("graft-bucketed-model").toString
    val path = s"$base/tbl"
    val nB = 4
    val rnd = new scala.util.Random(20260812L)
    var model = (0L until 20L).map(i => i -> s"v$i-0").toMap
    BucketedTable.write(model.toSeq.toDF("id", "v"), path, "id", nB)
    (1 to 12).foreach { step =>
      val key = rnd.nextInt(26).toLong // some keys never exist
      if (rnd.nextBoolean()) {
        val value = s"v$key-$step"
        BucketedTable.upsert(spark, path, Seq((key, value)).toDF("id", "v"), "id", nB)
        model += key -> value
      } else {
        BucketedTable.delete(spark, path, "id", key, nB)
        model -= key
      }
    }
    val got = BucketedTable.read(spark, path)
      .select("id", "v").as[(Long, String)].collect().toMap
    assert(got == model, s"table diverged from model after 12 ops")
  }

  test("delete that empties a bucket removes its directory") {
    val base = Files.createTempDirectory("graft-bucketed-empty").toString
    val path = s"$base/tbl"
    val nB = 16
    BucketedTable.write((0L until 10L).map(i => (i, s"v$i")).toDF("id", "v"),
      path, "id", nB)
    // find a key alone in its bucket
    val byBucket = BucketedTable.read(spark, path)
      .groupBy("bucket").count().filter($"count" === 1)
      .select("bucket").as[Int].collect()
    assert(byBucket.nonEmpty, "fixture has no singleton bucket")
    val b = byBucket.head
    val lone = BucketedTable.read(spark, path)
      .filter($"bucket" === b).select("id").as[Long].head()
    BucketedTable.delete(spark, path, "id", lone, nB)
    assert(!new java.io.File(s"$path/bucket=$b").exists,
      "emptied bucket directory must be removed")
    assert(BucketedTable.read(spark, path).count() == 9)
    // staged rewrite leaves no staging directories behind
    assert(!new java.io.File(base).listFiles().exists(_.getName.contains(".staging-")))
  }

  test("lookup hashes with the table's ACTUAL key type; mismatched probe type throws") {
    val base = Files.createTempDirectory("graft-bucketed-int").toString
    val path = s"$base/tbl"
    // INT key column: the old driver-side hash assumed LongType and
    // silently returned empty for every probe
    BucketedTable.write((0 until 20).map(i => (i, s"v$i")).toDF("id", "v"),
      path, "id", 8)
    val hit = BucketedTable.lookup(spark, path, "id", 7, 8)
      .select("v").as[String].collect().toSeq
    assert(hit == Seq("v7"))
    val e = intercept[IllegalArgumentException] {
      BucketedTable.lookup(spark, path, "id", 7L, 8).collect()
    }
    assert(e.getMessage.contains("does not match"), e.getMessage)
    // string keys work too — Literal converts, hash dispatches on type
    val base2 = Files.createTempDirectory("graft-bucketed-str").toString
    val path2 = s"$base2/tbl"
    BucketedTable.write(Seq(("alpha", 1), ("beta", 2)).toDF("k", "n"), path2, "k", 4)
    assert(BucketedTable.lookup(spark, path2, "k", "beta", 4)
      .select("n").as[Int].collect().toSeq == Seq(2))
  }
}
