package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.MathExprs.{int8Quantize, qdistSq}
import graft.ops.{Clustering, Pq, PqIndex}
import graft.sinks.ManifestTable

/** The persisted IVF-PQ index must be a pure relocation of the
  * in-query pieces: same exact-integer coarse training
  * (`Clustering.lloyd`), same coding (`Pq.codesCol`), so
  * build-then-search ≡ composing those pieces in-query — while IO
  * drops to "open only the probed lists' buckets, read only code
  * bytes". Appends encode against frozen models.
  */
class PqIndexSpec extends SparkSpec {
  import spark.implicits._

  private def clustered(n: Int, dim: Int = 64): Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(17)
    val centers = Array.fill(4, dim)(rnd.nextGaussian().toFloat * 4f)
    (0 until n).map { i =>
      val c = centers(i % 4)
      (i.toLong, c.map(x => x + 0.2f * rnd.nextGaussian().toFloat))
    }
  }

  private def tmp() = s"${Files.createTempDirectory("graft-pqidx")}/idx"

  /** The in-query expectation: quantize, train coarse+PQ with the same
    * params, assign lists, encode, keep candidates in the query's
    * probed lists, ADC-rank — element for element what search() does,
    * built only from the open-coded operator pieces.
    */
  private def inQuery(df: DataFrame, queries: DataFrame,
                      coarse: Array[Array[Double]], pq: Pq.Model,
                      topK: Int, nProbe: Int): Set[(Long, Long, Long)] = {
    val q = df.select($"vec_id", int8Quantize($"embedding").as("q"))
    val coded = Clustering.assign(q, coarse)
      .select($"cluster".as("list_id"), $"vec_id".as("id"),
        Pq.codesCol($"q", pq).as("codes"))
    val probes = queries
      .select($"vec_id".as("query_id"), int8Quantize($"embedding").as("qq"))
      .withColumn("probe", explode(PqIndex.probeLists($"qq", coarse, nProbe)))
    coded.join(broadcast(probes),
        $"list_id" === $"probe" && $"query_id" =!= $"id")
      .withColumn("dist", qdistSq($"qq", Pq.reconCol($"codes", pq)))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy($"dist", $"id")).cast("long"))
      .filter($"rank" <= topK)
      .select($"query_id", $"id", $"rank").as[(Long, Long, Long)]
      .collect().toSet
  }

  test("persisted search ≡ in-query composition; probes open only their buckets") {
    val df = clustered(200).toDF("vec_id", "embedding")
    val queries = df.filter($"vec_id" < 6)
    val path = tmp()
    PqIndex.build(spark, path, df, "vec_id", "embedding", dim = 64,
      kLists = 4, m = 8, k = 16, updates = 1, nBuckets = 4)

    val persisted = PqIndex.search(spark, path, queries, "vec_id", "embedding",
        topK = 3, nProbe = 2)
      .select($"query_id", $"neighbor_id", $"rank")
      .as[(Long, Long, Long)].collect().toSet
    val coarse = PqIndex.loadCoarse(spark, path)
    val pq = PqIndex.loadPq(spark, path)
    assert(persisted == inQuery(df, queries, coarse, pq, 3, 2),
      "persisted path must reproduce the in-query composition exactly")

    // IO scope: one query probing 2 of 4 lists must not open all buckets
    val probed = ManifestTable.readBuckets(spark, s"$path/lists",
      queries.limit(1).select(
        explode(PqIndex.probeLists(int8Quantize($"embedding"), coarse, 2))
          .as("list_id")))
    val total = ManifestTable.read(spark, s"$path/lists").inputFiles.length
    assert(probed.inputFiles.length < total,
      s"probe opened all $total files — manifest cut absent")
  }

  test("searchRefined re-ranks the ADC candidate set on exact distances") {
    import graft.functions.MathExprs.int8ToLongs
    val df = clustered(200).toDF("vec_id", "embedding")
    val queries = df.filter($"vec_id" < 6)
    val path = tmp()
    PqIndex.build(spark, path, df, "vec_id", "embedding", dim = 64,
      kLists = 4, m = 8, k = 16, updates = 1, nBuckets = 4)
    val refined = PqIndex.searchRefined(spark, path, queries, df,
        "vec_id", "embedding", topK = 3, nProbe = 2, refineFactor = 4)
      .select($"query_id", $"neighbor_id", $"dist", $"rank")
      .as[(Long, Long, Double, Long)].collect().toSet
    // independent expectation: the persisted ADC probe's top-c candidate
    // set, re-scored on exact quantized vectors composed from the public
    // pieces (different join shape, same kernels)
    val cands = PqIndex.search(spark, path, queries, "vec_id", "embedding",
        topK = 12, nProbe = 2)
      .select("query_id", "neighbor_id")
    val qz = df.select($"vec_id", int8Quantize($"embedding").as("qv"))
    val expected = cands
      .join(qz.toDF("neighbor_id", "qn"), "neighbor_id")
      .join(qz.toDF("query_id", "qq"), "query_id")
      .withColumn("dist",
        qdistSq($"qq", transform(int8ToLongs($"qn"), _.cast("double"))))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy($"dist", $"neighbor_id")).cast("long"))
      .filter($"rank" <= 3)
      .select($"query_id", $"neighbor_id", $"dist", $"rank")
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(refined == expected,
      "searchRefined must equal exact re-rank of the ADC candidate set")
    // exact re-score is integer arithmetic
    assert(refined.forall { case (_, _, d, _) => d == math.rint(d) })
  }

  test("persisted models round-trip bit-for-bit") {
    val df = clustered(150).toDF("vec_id", "embedding")
    val path = tmp()
    PqIndex.build(spark, path, df, "vec_id", "embedding", dim = 64,
      kLists = 4, m = 8, k = 16, updates = 1, nBuckets = 4)
    val q = df.select($"vec_id", int8Quantize($"embedding").as("q"))
    val coarseTrained = Clustering.lloyd(q, 4, 1)
    val pqTrained = Pq.train(df, "vec_id", "embedding", 64, 8, 16, 1)
    assert(PqIndex.loadCoarse(spark, path).map(_.toSeq).toSeq ==
      coarseTrained.map(_.toSeq).toSeq)
    assert(PqIndex.loadPq(spark, path).codebooks.map(_.map(_.toSeq).toSeq).toSeq ==
      pqTrained.codebooks.map(_.map(_.toSeq).toSeq).toSeq)
  }

  test("sync: exactly-once maintenance from a manifest corpus, SQL lifecycle") {
    val all = clustered(160)
    val (a, b) = all.splitAt(100)
    val corpus = tmp(); val idx = tmp()
    ManifestTable.write(a.toDF("vec_id", "embedding"), corpus, "vec_id", 2)
    assert(PqIndex.sync(spark, idx, corpus, "vec_id", "embedding",
      kLists = 4, nBuckets = 4), "first sync builds")
    // SQL lifecycle: USING PQ routes to the coded index — created at
    // the SAME corpus state, so its frozen models equal sync's (PQ
    // ranks depend on the codebooks, unlike IvfIndex's exact rescoring)
    val sqlIdx = tmp()
    spark.sql(s"GRAFT CREATE VECTOR INDEX '$sqlIdx' FROM '$corpus' " +
      "KEY vec_id VECTOR embedding LISTS 4 BUCKETS 4 USING PQ")

    ManifestTable.append(spark, corpus,
      b.toDF("vec_id", "embedding"), "vec_id")
    assert(PqIndex.sync(spark, idx, corpus, "vec_id", "embedding"),
      "second sync folds the delta")
    assert(!PqIndex.sync(spark, idx, corpus, "vec_id", "embedding"),
      "current index must report false")

    // ≡ build(a) + append(b): training is id-sorted, coding frozen
    val ref = tmp()
    PqIndex.build(spark, ref, a.toDF("vec_id", "embedding"),
      "vec_id", "embedding", dim = 64, kLists = 4, nBuckets = 4)
    PqIndex.append(spark, ref, b.toDF("vec_id", "embedding"),
      "vec_id", "embedding")
    val q = all.take(4).toDF("vec_id", "embedding")
    def res(p: String) = PqIndex.search(spark, p, q, "vec_id", "embedding",
        topK = 4, nProbe = 2)
      .select($"query_id", $"neighbor_id", $"rank")
      .as[(Long, Long, Long)].collect().toSet
    assert(res(idx) == res(ref), "sync must equal build+append")

    // GRAFT REFRESH dispatches on the def's ivfpq kind: folds the
    // appended delta into the SQL-created index, after which it equals
    // the sync-maintained one exactly
    assert(spark.sql(s"GRAFT REFRESH '$sqlIdx'").collect()
      .head.getString(2) == "true", "refresh must fold the delta")
    assert(res(sqlIdx) == res(idx), "refreshed SQL index must equal sync's")
    assert(spark.sql(s"GRAFT REFRESH '$idx'").collect()
      .head.getString(2) == "false", "current index must report false via SQL")

    // non-append corpus change refuses with the rebuild demand
    ManifestTable.deleteKeys(spark, corpus, Seq(5L).toDF("vec_id"), "vec_id")
    val e = intercept[IllegalArgumentException] {
      PqIndex.sync(spark, idx, corpus, "vec_id", "embedding")
    }
    assert(e.getMessage.contains("REBUILD INDEX"))
  }

  test("GRAFT VERIFY DEEP audits index recall and names a centroid-drifted index") {
    val all = clustered(160)
    val corpus = tmp(); val idx = tmp()
    ManifestTable.write(all.toDF("vec_id", "embedding"), corpus, "vec_id", 2)
    PqIndex.sync(spark, idx, corpus, "vec_id", "embedding",
      kLists = 4, nBuckets = 4)
    def recallRow() = spark.sql(s"GRAFT VERIFY '$idx' DEEP").collect()
      .find(_.getString(1) == "index_recall")
      .getOrElse(fail("VERIFY DEEP on an index must include index_recall"))
    val healthy = recallRow()
    assert(healthy.getString(2) == "ok",
      s"healthy index must pass the recall audit: ${healthy.getString(3)}")
    // fast (non-DEEP) checks: def + model shapes + lists fsck, all green,
    // and no recall row (it is the DEEP full-scan audit)
    val fast = spark.sql(s"GRAFT VERIFY '$idx'").collect()
    assert(fast.nonEmpty && fast.forall(_.getString(2) == "ok"),
      fast.map(r => s"${r.getString(1)}=${r.getString(2)}").mkString(", "))
    assert(!fast.exists(_.getString(1) == "index_recall"))
    // plant drift: rotate the coarse centroids one list over — the coded
    // lists stay assigned under the OLD routing, probes follow the new
    // one, so every query lands in the wrong inverted list. Storage
    // checks cannot see this; only the recall audit can.
    val cents = spark.read.parquet(s"$idx/_centroids").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1)))
    val k = cents.length
    cents.map { case (id, c) => ((id + 1) % k, c) }.toSeq
      .toDF("list_id", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$idx/_centroids")
    val drifted = recallRow()
    assert(drifted.getString(2) == "WARN",
      s"drifted index must WARN: ${drifted.getString(2)} ${drifted.getString(3)}")
    assert(drifted.getString(3).contains("recall@5"),
      "the audit detail must carry the measured recall")
  }

  test("MAINTAIN heals a stale index: REFRESH advised in DRY, executed otherwise; DESCRIBE shows the watermark") {
    val all = clustered(160)
    val (a, b) = all.splitAt(100)
    val corpus = tmp(); val idx = tmp()
    ManifestTable.write(a.toDF("vec_id", "embedding"), corpus, "vec_id", 2)
    PqIndex.sync(spark, idx, corpus, "vec_id", "embedding",
      kLists = 4, nBuckets = 4)
    // current index: no refresh advised, VERIFY freshness green
    assert(!spark.sql(s"GRAFT MAINTAIN '$idx' DRY").collect()
      .exists(_.getString(1) == "refresh"))
    // the corpus moves; the index watermark now trails
    ManifestTable.append(spark, corpus, b.toDF("vec_id", "embedding"), "vec_id")
    val head = ManifestTable.headVersion(spark, corpus).get
    val asOf = graft.ops.IndexAudit.staleness(spark, idx).get._1
    assert(asOf < head, "fixture must be stale")
    // DESCRIBE carries the trailing watermark
    assert(spark.sql(s"GRAFT DESCRIBE '$idx'").collect().head.getString(1)
      .contains(s"as_of corpus v$asOf of v$head"))
    // VERIFY's fast freshness check names it
    val freshness = spark.sql(s"GRAFT VERIFY '$idx'").collect()
      .find(_.getString(1) == "index_freshness").get
    assert(freshness.getString(2) == "WARN", freshness.getString(3))
    // DRY advises REFRESH and executes nothing
    val dry = spark.sql(s"GRAFT MAINTAIN '$idx' DRY").collect()
      .filter(_.getString(1) == "refresh")
    assert(dry.nonEmpty && dry.head.getString(3) == "false",
      "DRY must advise refresh without executing")
    assert(graft.ops.IndexAudit.staleness(spark, idx).get._1 == asOf)
    // non-DRY executes: the watermark heals to the corpus head
    assert(spark.sql(s"GRAFT MAINTAIN '$idx'").collect()
      .exists(r => r.getString(1) == "refresh" && r.getString(3) == "true"))
    assert(graft.ops.IndexAudit.staleness(spark, idx).get == (head.toLong, head))
    assert(!spark.sql(s"GRAFT MAINTAIN '$idx' DRY").collect()
      .exists(_.getString(1) == "refresh"))
    assert(spark.sql(s"GRAFT DESCRIBE '$idx'").collect().head.getString(1)
      .contains(s"as_of corpus v$head of v$head"))
    // and the healed index answers over the appended vectors
    val q = b.take(2).toDF("vec_id", "embedding")
    assert(PqIndex.search(spark, idx, q, "vec_id", "embedding",
      topK = 3, nProbe = 2).count() > 0)
  }

  test("GRAFT SEARCH VECTOR queries the index from SQL; REFINE runs the exact re-rank") {
    import graft.ops.IvfIndex
    val all = clustered(160)
    val corpus = tmp(); val idx = tmp(); val qtab = tmp()
    ManifestTable.write(all.toDF("vec_id", "embedding"), corpus, "vec_id", 2)
    PqIndex.sync(spark, idx, corpus, "vec_id", "embedding",
      kLists = 4, nBuckets = 4)
    val qRows = all.take(4)
    ManifestTable.write(qRows.toDF("vec_id", "embedding"), qtab, "vec_id", 2)
    val queries = ManifestTable.read(spark, qtab)
    def collected(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Double, Long)].collect().sortBy(t => (t._1, t._4)).toSeq
    // plain ADC probe ≡ API
    assert(collected(spark.sql(
        s"GRAFT SEARCH VECTOR '$idx' FROM '$qtab' TOP 3 PROBE 2")) ==
      collected(PqIndex.search(spark, idx, queries, "vec_id", "embedding",
          topK = 3, nProbe = 2)
        .select($"query_id", $"neighbor_id", $"dist".as("score"), $"rank")))
    // refined ≡ API refine
    assert(collected(spark.sql(
        s"GRAFT SEARCH VECTOR '$idx' FROM '$qtab' TOP 3 PROBE 2 REFINE FACTOR 8")) ==
      collected(PqIndex.searchRefined(spark, idx, queries,
          ManifestTable.read(spark, corpus), "vec_id", "embedding",
          topK = 3, nProbe = 2, refineFactor = 8)
        .select($"query_id", $"neighbor_id", $"dist".as("score"), $"rank")))
    // the ivf kind answers too, and refuses REFINE honestly
    val ivfIdx = tmp()
    IvfIndex.sync(spark, ivfIdx, corpus, "vec_id", "embedding",
      k = 4, nBuckets = 4)
    assert(collected(spark.sql(
        s"GRAFT SEARCH VECTOR '$ivfIdx' FROM '$qtab' TOP 3 PROBE 2")) ==
      collected(IvfIndex.search(spark, ivfIdx, queries, "vec_id", "embedding",
          k = 3, nProbe = 2)
        .select($"query_id".cast("long"), $"neighbor_id".cast("long"),
          $"sim".as("score"), $"rank")))
    val e = intercept[Exception] {
      spark.sql(s"GRAFT SEARCH VECTOR '$ivfIdx' FROM '$qtab' REFINE").collect()
    }
    assert(e.getMessage.contains("REFINE applies to PQ indexes"))
  }

  test("AutoMaintain.startIndex: corpus commits drive the index back to fresh, hands-off") {
    val all = clustered(160)
    val (a, b) = all.splitAt(100)
    val corpus = tmp(); val idx = tmp()
    ManifestTable.write(a.toDF("vec_id", "embedding"), corpus, "vec_id", 2)
    PqIndex.sync(spark, idx, corpus, "vec_id", "embedding",
      kLists = 4, nBuckets = 4)
    // corpus moves → stale index
    ManifestTable.append(spark, corpus, b.toDF("vec_id", "embedding"), "vec_id")
    val head = ManifestTable.headVersion(spark, corpus).get
    assert(graft.ops.IndexAudit.staleness(spark, idx).get._1 < head)
    // one drain of the corpus commit stream heals the watermark
    val ckpt = s"${Files.createTempDirectory("graft-am-idx")}/ckpt"
    graft.streaming.AutoMaintain.startIndex(spark, idx, ckpt,
        trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .awaitTermination(180000)
    assert(graft.ops.IndexAudit.staleness(spark, idx).get == (head.toLong, head),
      "drain must refresh the index to the corpus head")
    // fixpoint: a second drain over a fresh checkpoint commits nothing
    val v = ManifestTable.headVersion(spark, s"$idx/lists").get
    graft.streaming.AutoMaintain.startIndex(spark, idx,
        s"${Files.createTempDirectory("graft-am-idx")}/ckpt2",
        trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .awaitTermination(180000)
    assert(ManifestTable.headVersion(spark, s"$idx/lists").get == v,
      "fresh index must not re-commit")
    // and the healed index answers over the appended vectors
    assert(PqIndex.search(spark, idx, b.take(2).toDF("vec_id", "embedding"),
      "vec_id", "embedding", topK = 3, nProbe = 2).count() > 0)
  }

  test("append encodes against frozen models; appended vectors immediately searchable") {
    val all = clustered(160)
    val (first, second) = all.splitAt(100)
    val path = tmp()
    PqIndex.build(spark, path, first.toDF("vec_id", "embedding"),
      "vec_id", "embedding", dim = 64, kLists = 4, m = 8, k = 16,
      updates = 1, nBuckets = 4)
    PqIndex.append(spark, path, second.toDF("vec_id", "embedding"),
      "vec_id", "embedding")

    val q = second.take(2).toDF("vec_id", "embedding")
    val res = PqIndex.search(spark, path, q, "vec_id", "embedding",
        topK = 5, nProbe = 2)
      .select($"query_id", $"neighbor_id", $"rank")
      .as[(Long, Long, Long)].collect()
    assert(res.nonEmpty, "appended index must answer")
    // equivalence vs the in-query composition over the FULL corpus with
    // the frozen (first-batch-trained) models — append must not perturb
    val coarse = PqIndex.loadCoarse(spark, path)
    val pq = PqIndex.loadPq(spark, path)
    assert(res.toSet ==
      inQuery(all.toDF("vec_id", "embedding"), q, coarse, pq, 5, 2))
    // every ADC hit stays in the query's planted cluster
    assert(res.forall { case (qid, nid, _) => qid % 4 == nid % 4 })
  }

  test("GRAFT VERIFY on a corrupt index definition reports FAIL, not a crash") {
    // isIndex() only proves _index.json EXISTS; an unreadable definition
    // (here: a directory where the file should be) must surface as the
    // documented (index_def, FAIL, ...) row — the audit is the one
    // surface meant to DIAGNOSE a broken index (ADVICE r14)
    val path = java.nio.file.Files
      .createTempDirectory("graft-corrupt-idx").toString
    java.nio.file.Files.createDirectory(
      java.nio.file.Paths.get(path, "_index.json"))
    val rows = spark.sql(s"GRAFT VERIFY '$path'").collect()
    assert(rows.length == 1 && rows.head.getString(1) == "index_def" &&
      rows.head.getString(2) == "FAIL",
      s"corrupt def must produce the FAIL row: ${rows.toSeq}")
  }
}
