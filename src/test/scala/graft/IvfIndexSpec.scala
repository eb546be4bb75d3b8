package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.{Ivf, IvfIndex}
import graft.sinks.ManifestTable

/** The persisted IVF index must be a pure RELOCATION of the in-query
  * path: same deterministic training, same assignments, so
  * build-then-search ≡ `Ivf.searchTopK` bit-for-bit — while the IO
  * shape changes from "re-assign the corpus per search" to "open only
  * the probed lists' buckets". Appends index against FROZEN centroids
  * and must be immediately searchable.
  */
class IvfIndexSpec extends SparkSpec {
  import spark.implicits._

  private def clustered(n: Int, dim: Int, seed: Int = 11): Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(seed)
    val centers = Array.fill(4, dim)(rnd.nextGaussian().toFloat)
    (0 until n).map { i =>
      val c = centers(i % 4)
      (i.toLong, c.map(x => x + 0.05f * rnd.nextGaussian().toFloat))
    }
  }

  private def tmp() = s"${Files.createTempDirectory("graft-ivfidx")}/idx"

  test("persisted search ≡ in-query searchTopK; probes open only their buckets") {
    val df = clustered(240, 12).toDF("vec_id", "embedding")
    val queries = df.filter($"vec_id" < 8)
    val path = tmp()
    IvfIndex.build(spark, path, df, "vec_id", "embedding",
      k = 4, nBuckets = 4)
    val model = Ivf.train(df, "vec_id", "embedding", k = 4)
    assert(IvfIndex.loadModel(spark, path).centroids.map(_.toSeq).toSeq ==
      model.centroids.map(_.toSeq).toSeq, "persisted model must be the trained one")

    val persisted = IvfIndex.search(spark, path, queries, "vec_id", "embedding",
        k = 3, nProbe = 2)
      .as[(Long, Long, Double, Long)].collect().toSet
    val inQuery = Ivf.searchTopK(df, queries, "vec_id", "embedding", k = 3,
        model, nProbe = 2)
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(persisted == inQuery, "persisted path must reproduce searchTopK exactly")

    // IO scope: the probed candidate read must not open every bucket.
    // One query probing 2 of 4 lists touches at most 2 of 4 buckets.
    val one = queries.limit(1)
    val probed = ManifestTable.readBuckets(spark, s"$path/lists",
      one.select(explode(Ivf.probeLists($"embedding", model, 2)).as("list_id")))
    val total = ManifestTable.read(spark, s"$path/lists").inputFiles.length
    assert(probed.inputFiles.length < total,
      s"probe opened all $total files — manifest cut absent")
  }

  test("append indexes against frozen centroids; appended vectors are immediately searchable") {
    val all = clustered(200, 12)
    val (first, second) = all.splitAt(120)
    val path = tmp()
    IvfIndex.build(spark, path, first.toDF("vec_id", "embedding"),
      "vec_id", "embedding", k = 4, nBuckets = 4)
    IvfIndex.append(spark, path, second.toDF("vec_id", "embedding"),
      "vec_id", "embedding")

    // an appended vector's own twin (same generator cluster, id ≡ mod 4)
    // must surface; the appended row itself must be a findable neighbor
    val q = second.take(2).toDF("vec_id", "embedding")
    val res = IvfIndex.search(spark, path, q, "vec_id", "embedding",
        k = 5, nProbe = 2)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
    assert(res.nonEmpty, "appended index must answer")
    val neighborsOfFirstQ = res.filter(_._1 == second.head._1).map(_._2).toSet
    assert(neighborsOfFirstQ.nonEmpty &&
      neighborsOfFirstQ.exists(n => (n - second.head._1) % 4 == 0),
      s"cluster-mates missing from $neighborsOfFirstQ")

    // equivalence vs in-query search with the SAME frozen model over the
    // full corpus (append must not perturb assignments)
    val model = IvfIndex.loadModel(spark, path)
    val inQuery = Ivf.searchTopK(all.toDF("vec_id", "embedding"), q,
        "vec_id", "embedding", k = 5, model, nProbe = 2)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    assert(res.toSet == inQuery,
      "append path must equal frozen-model in-query search")
  }

  test("GRAFT VERIFY DEEP audits the ivf kind: cosine-brute recall on a healthy index") {
    val all = clustered(200, 12)
    val corpus = tmp(); val idx = tmp()
    ManifestTable.write(all.toDF("vec_id", "embedding"), corpus, "vec_id", 2)
    IvfIndex.sync(spark, idx, corpus, "vec_id", "embedding",
      k = 4, nBuckets = 4)
    val rows = spark.sql(s"GRAFT VERIFY '$idx' DEEP").collect()
    val recall = rows.find(_.getString(1) == "index_recall")
      .getOrElse(fail("ivf VERIFY DEEP must include index_recall"))
    assert(recall.getString(2) == "ok",
      s"healthy clustered ivf index must clear the floor: ${recall.getString(3)}")
    assert(rows.find(_.getString(1) == "index_def").get.getString(3)
      .contains("kind=ivf"))
    assert(rows.find(_.getString(1) == "index_freshness").get.getString(2) == "ok")
  }

  test("DESCRIBE degrades to a diagnostic on an unknown index kind instead of throwing from the vector-vitals read") {
    // an index root whose _def declares a kind this engine doesn't
    // know (corrupt def, or a future format) must not take the whole
    // DESCRIBE down by reading _centroids that aren't there
    // (ADVICE r16): the vitals branch is gated on the DECLARED kind
    val all = clustered(60, 12)
    val corpus = tmp(); val idx = tmp()
    ManifestTable.write(all.toDF("vec_id", "embedding"), corpus, "vec_id", 2)
    IvfIndex.sync(spark, idx, corpus, "vec_id", "embedding",
      k = 4, nBuckets = 4)
    // rewrite the def's kind and remove the centroid table — the
    // failure shape the old code threw on
    val defPath = java.nio.file.Paths.get(idx, "_index.json")
    val body = new String(java.nio.file.Files.readAllBytes(defPath), "UTF-8")
    java.nio.file.Files.write(defPath,
      body.replace("\"kind\":\"ivf\"", "\"kind\":\"hnsw\"")
        .getBytes("UTF-8"))
    // the raw rewrite invalidates Hadoop's local-FS checksum sidecar
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(idx, "._index.json.crc"))
    def rmTree(p: java.nio.file.Path): Unit = {
      if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.list(p).forEach(rmTree(_))
      java.nio.file.Files.delete(p)
    }
    rmTree(java.nio.file.Paths.get(idx, "_centroids"))
    val vital = spark.sql(s"GRAFT DESCRIBE '$idx'").collect()
      .head.getString(13)
    assert(vital.contains("unknown index kind 'hnsw'"),
      s"DESCRIBE must degrade to a named diagnostic: $vital")
  }

  test("VERIFY DEEP balance audit: healthy index ok; a piled-up append WARNs with exact occupancy") {
    val all = clustered(200, 12)
    val corpus = tmp(); val idx = tmp()
    ManifestTable.write(all.toDF("vec_id", "embedding"), corpus, "vec_id", 2)
    IvfIndex.sync(spark, idx, corpus, "vec_id", "embedding",
      k = 4, nBuckets = 4)
    def balance() = spark.sql(s"GRAFT VERIFY '$idx' DEEP").collect()
      .find(_.getString(1) == "index_balance")
      .getOrElse(fail("vector VERIFY DEEP must include index_balance"))
    val healthy = balance()
    assert(healthy.getString(2) == "ok",
      s"4 even generator clusters are balanced: ${healthy.getString(3)}")
    assert(healthy.getString(3).contains("4 trained"),
      s"detail names the trained list count: ${healthy.getString(3)}")
    // a balanced index earns no skew pointer from MAINTAIN's
    // metadata-only advice
    assert(!spark.sql(s"GRAFT MAINTAIN '$idx' DRY").collect()
      .exists(_.getString(1) == "verify-deep"),
      "healthy index must not be told to run the balance audit")
    // DESCRIBE reports the PROBE AUTO inputs for vector indexes: the
    // trained list count and the indexed rowcount
    val vital = spark.sql(s"GRAFT DESCRIBE '$idx'").collect()
      .head.getString(13)
    assert(vital.startsWith("lists=4, indexed=200, model_gen=0"),
      s"vector DESCRIBE must carry lists/indexed/generation vitals: $vital")

    // the frozen-centroid drift mode: every appended vector is a
    // near-duplicate of ONE existing cluster member, so the whole
    // 1000-row batch assigns to that member's list — max/mean = 3.5x,
    // past the 4-list effective threshold min(4.0, 4/2) = 2.0 (the
    // ratio is bounded by trained=4, which is why the threshold is
    // list-count-aware)
    val seed = all.head._2
    val piled = (1000L until 2000L).map(i =>
      (i, seed.map(x => x + 0.001f * ((i % 7) - 3))))
    ManifestTable.append(spark, corpus,
      piled.toDF("vec_id", "embedding"), "vec_id")
    spark.sql(s"GRAFT MAINTAIN '$idx'") // folds the delta (frozen model)
    val drifted = balance()
    assert(drifted.getString(2) == "WARN",
      s"1000 near-dup appends into one list must WARN: ${drifted.getString(3)}")
    assert(drifted.getString(3).contains("1200 vectors") &&
      drifted.getString(3).contains("REBUILD INDEX"),
      s"detail carries exact totals and the retrain action: ${drifted.getString(3)}")
    // exact fat-list count: 1000 appends + the seed's own cluster (50
    // of 200 initial vectors sit in the seed's generator cluster)
    assert(drifted.getString(3).contains("max list 1050"),
      s"occupancy is exact, not sampled: ${drifted.getString(3)}")

    // the METADATA-ONLY early warning: MAINTAIN (and its DRY advice)
    // flags the byte-skewed lists bucket and points at VERIFY DEEP —
    // zero data IO, so the auto-maintain cadence can afford it
    val dry = spark.sql(s"GRAFT MAINTAIN '$idx' DRY").collect()
    val skew = dry.filter(_.getString(1) == "verify-deep")
    assert(skew.nonEmpty,
      s"drifted index must surface the bucket-skew pointer: " +
        s"${dry.map(_.getString(1)).toSeq}")
    assert(skew.head.getString(2).contains("VERIFY") &&
      skew.head.getString(2).contains("fat"),
      s"the advice names the exact audit: ${skew.head.getString(2)}")
  }

  test("sync: exactly-once maintenance from a manifest corpus") {
    val all = clustered(240, 12)
    val (a, b) = all.splitAt(160)
    val corpus = tmp(); val idx = tmp()
    ManifestTable.write(a.toDF("vec_id", "embedding"), corpus, "vec_id", 2)
    assert(IvfIndex.sync(spark, idx, corpus, "vec_id", "embedding",
      k = 4, nBuckets = 4), "first sync builds")
    ManifestTable.append(spark, corpus,
      b.toDF("vec_id", "embedding"), "vec_id")
    assert(IvfIndex.sync(spark, idx, corpus, "vec_id", "embedding"),
      "second sync folds the delta")
    assert(!IvfIndex.sync(spark, idx, corpus, "vec_id", "embedding"),
      "current index must report false")

    // ≡ build(a) + append(b): train is id-sorted so the manifest read
    // order cannot perturb the model, and the frozen-centroid
    // assignment is row-local
    val ref = tmp()
    IvfIndex.build(spark, ref, a.toDF("vec_id", "embedding"),
      "vec_id", "embedding", k = 4, nBuckets = 4)
    IvfIndex.append(spark, ref, b.toDF("vec_id", "embedding"),
      "vec_id", "embedding")
    val q = all.take(6).toDF("vec_id", "embedding")
    def res(p: String) = IvfIndex.search(spark, p, q, "vec_id", "embedding",
        k = 4, nProbe = 2)
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(res(idx) == res(ref), "sync must equal build+append")

    // GRAFT REFRESH dispatches on the persisted def's kind
    assert(spark.sql(s"GRAFT REFRESH '$idx'").collect()
      .head.getString(2) == "false", "current index must report false via SQL")

    // SQL lifecycle: CREATE VECTOR INDEX builds an equivalent index
    val sqlIdx = tmp()
    spark.sql(s"GRAFT CREATE VECTOR INDEX '$sqlIdx' FROM '$corpus' " +
      "KEY vec_id VECTOR embedding LISTS 4 BUCKETS 4")
    assert(res(sqlIdx) == res(idx), "SQL-created index must equal sync's")

    // non-append corpus change refuses with the rebuild demand
    ManifestTable.deleteKeys(spark, corpus, Seq(5L).toDF("vec_id"), "vec_id")
    val e = intercept[IllegalArgumentException] {
      IvfIndex.sync(spark, idx, corpus, "vec_id", "embedding")
    }
    assert(e.getMessage.contains("REBUILD INDEX"))
  }
}
