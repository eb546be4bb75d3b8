package graft

import java.nio.file.Files
import graft.ops.{Dedup, IncrementalDedup}
import graft.sinks.ManifestTable

/** The incremental contract: probing batches one at a time against the
  * accumulated index finds exactly the near-dup pairs a from-scratch
  * whole-corpus run finds (restricted to pairs touching the batch), and
  * the accumulation step is append-only — no index bucket is ever
  * rewritten by a batch landing.
  */
class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2L, "completely different text about spark catalyst optimizer rules"),
    (3L, "the quick brown fox jumps over the lazy dog near the river bend"),
    (4L, "unrelated payload mentioning parquet footers and column pruning")
  ).toDF("doc_id", "text")

  // batch 1 duplicates a corpus doc; batch 2 duplicates a batch-1 doc —
  // catching it requires batch 1's entries to have been APPENDED
  private val batch1 = Seq(
    (10L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (11L, "novel text with no duplicate anywhere in the corpus at all")
  ).toDF("doc_id", "text")
  private val batch2 = Seq(
    (20L, "novel text with no duplicate anywhere in the corpus at all"),
    (21L, "another singleton document that matches nothing else here")
  ).toDF("doc_id", "text")

  test("probe finds corpus-vs-batch and batch-internal pairs; append makes batches probeable") {
    val idx = s"${Files.createTempDirectory("graft-inc")}/index"
    IncrementalDedup.buildIndex(corpus, idx, "doc_id", "text",
      shingleN = 2, numHashes = 64, bands = 16, nBuckets = 8)

    val p1 = IncrementalDedup.probe(spark, idx, batch1, "doc_id", "text",
      shingleN = 2, numHashes = 64, bands = 16, threshold = 0.5)
      .select("id_l", "id_r").as[(Long, Long)].collect().toSet
    assert(p1.contains((1L, 10L)), s"exact dup of corpus doc not found: $p1")
    assert(!p1.exists { case (l, r) => l == 11L || r == 11L },
      s"singleton batch doc paired: $p1")

    // accumulate batch 1, then batch 2's dup of a batch-1 doc is found
    IncrementalDedup.appendBatch(spark, idx, batch1, "doc_id", "text",
      shingleN = 2, numHashes = 64, bands = 16)
    val p2 = IncrementalDedup.probe(spark, idx, batch2, "doc_id", "text",
      shingleN = 2, numHashes = 64, bands = 16, threshold = 0.5)
      .select("id_l", "id_r").as[(Long, Long)].collect().toSet
    assert(p2.contains((11L, 20L)), s"dup against an appended batch missed: $p2")
    assert(!p2.exists { case (l, r) => l == 21L || r == 21L }, s"$p2")
  }

  test("incremental probe ≡ from-scratch minhash pairs restricted to pairs touching the batch") {
    val idx = s"${Files.createTempDirectory("graft-inc")}/index"
    val docs = graft.model.Tables.documents(spark, sfDir)
    val old = docs.filter($"doc_id" % 10 < 8)
    val batch = docs.filter($"doc_id" % 10 >= 8)
    IncrementalDedup.buildIndex(old, idx, "doc_id", "text",
      shingleN = 2, numHashes = 64, bands = 16, nBuckets = 16)
    val inc = IncrementalDedup.probe(spark, idx, batch, "doc_id", "text",
      shingleN = 2, numHashes = 64, bands = 16, threshold = 0.5)
      .select("id_l", "id_r").as[(Long, Long)].collect().toSet

    // from-scratch reference: every band-collision pair over the WHOLE
    // corpus (straight self-join — no mega-bucket star), est ≥ 0.5,
    // restricted to pairs with ≥1 batch member
    val prepared = Dedup.prepareMinhash(docs, "doc_id", "text", 2, 64, 16)
    import org.apache.spark.sql.functions._
    val e = prepared.select(col("id"), col("sig"),
      posexplode(col("bands")).as(Seq("band", "bh")))
    val scratch = e.alias("l").join(e.alias("r"),
        col("l.band") === col("r.band") && col("l.bh") === col("r.bh") &&
          col("l.id") < col("r.id"))
      .filter(Dedup.estJaccard(col("l.sig"), col("r.sig"), 64) >= 0.5)
      .filter(col("l.id") % 10 >= 8 || col("r.id") % 10 >= 8)
      .select(col("l.id"), col("r.id")).distinct()
      .as[(Long, Long)].collect().toSet
    assert(inc == scratch,
      s"incremental=${inc.size} scratch=${scratch.size}; " +
        s"missing=${(scratch -- inc).take(5)} extra=${(inc -- scratch).take(5)}")
  }

  test("sf0.1 batched accumulation: 5 probe+append rounds find exactly the from-scratch pair set [slow]") {
    import org.apache.spark.sql.functions._
    val idx = s"${Files.createTempDirectory("graft-inc-sf01")}/index"
    val docs = graft.model.Tables.documents(spark, "/root/testdata/sf0.1")
    def batch(k: Int) = docs.filter($"doc_id" % 5 === k)
    // seed with batch 0 and probe it against itself (cross ≡ intra after
    // least/greatest normalization), then land batches 1..4 the way a
    // daily pipeline would: probe against everything accumulated, append
    IncrementalDedup.buildIndex(batch(0), idx, "doc_id", "text",
      shingleN = 2, numHashes = 64, bands = 16, nBuckets = 16)
    var found = Set.empty[(Long, Long)]
    (0 to 4).foreach { k =>
      found ++= IncrementalDedup.probe(spark, idx, batch(k), "doc_id", "text",
          shingleN = 2, numHashes = 64, bands = 16, threshold = 0.5)
        .select("id_l", "id_r").as[(Long, Long)].collect()
      if (k > 0) IncrementalDedup.appendBatch(spark, idx, batch(k),
        "doc_id", "text", shingleN = 2, numHashes = 64, bands = 16)
    }
    val prepared = Dedup.prepareMinhash(docs, "doc_id", "text", 2, 64, 16)
    val e = prepared.select(col("id"), col("sig"),
      posexplode(col("bands")).as(Seq("band", "bh")))
    val scratch = e.alias("l").join(e.alias("r"),
        col("l.band") === col("r.band") && col("l.bh") === col("r.bh") &&
          col("l.id") < col("r.id"))
      .filter(Dedup.estJaccard(col("l.sig"), col("r.sig"), 64) >= 0.5)
      .select(col("l.id"), col("r.id")).distinct()
      .as[(Long, Long)].collect().toSet
    assert(found == scratch,
      s"incremental=${found.size} scratch=${scratch.size}; " +
        s"missing=${(scratch -- found).take(5)} extra=${(found -- scratch).take(5)}")
  }

  test("probe plans a storage-partitioned join: no Exchange above the index-side scan") {
    val idx = s"${Files.createTempDirectory("graft-inc")}/index"
    val docs = graft.model.Tables.documents(spark, sfDir)
    IncrementalDedup.buildIndex(docs.filter($"doc_id" % 10 < 8), idx,
      "doc_id", "text", shingleN = 2, numHashes = 64, bands = 16, nBuckets = 16)
    val probe = IncrementalDedup.probe(spark, idx,
      docs.filter($"doc_id" % 10 >= 8), "doc_id", "text",
      shingleN = 2, numHashes = 64, bands = 16, threshold = 0.5)
    val p = probe.queryExecution.executedPlan.toString
    assert(p.contains("ManifestIndexScan"), p.take(800))
    // the index slice arrives key-grouped: every line between a join and
    // the ManifestIndexScan leaf under it must be exchange-free (the
    // batch side shuffles INTO the layout instead). Walk each scan leaf
    // upward: no Exchange may appear before the first join above it.
    val lines = p.split("\n")
    lines.zipWithIndex.filter(_._1.contains("ManifestIndexScan")).foreach {
      case (_, scanIdx) =>
        val above = lines.slice(0, scanIdx).reverse
        val depth = (l: String) => l.takeWhile(c => !c.isLetter).length
        val scanDepth = depth(lines(scanIdx))
        // ancestors = nearest preceding lines with strictly smaller indent
        var d = scanDepth
        val ancestors = above.filter { l =>
          val ld = depth(l)
          if (ld < d) { d = ld; true } else false
        }
        val toJoin = ancestors.takeWhile(l =>
          !l.contains("Join") && !l.contains("HashAggregate"))
        assert(!toJoin.exists(_.contains("Exchange")),
          s"Exchange above index scan:\n${toJoin.mkString("\n")}\n---\n$p")
    }
  }

  test("append never rewrites existing index files; compact folds wide buckets") {
    val idx = s"${Files.createTempDirectory("graft-inc")}/index"
    IncrementalDedup.buildIndex(corpus, idx, "doc_id", "text",
      shingleN = 2, numHashes = 64, bands = 16, nBuckets = 4)
    def files(p: String): Set[String] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles.toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(s"$p/data")).map(_.getPath).toSet
    }
    val before = files(idx)
    IncrementalDedup.appendBatch(spark, idx, batch1, "doc_id", "text",
      shingleN = 2, numHashes = 64, bands = 16)
    val after = files(idx)
    assert(before.subsetOf(after),
      s"append rewrote existing files: ${(before -- after).take(3)}")

    val total = ManifestTable.read(spark, idx).count()
    // many appends widen directory lists; compact folds them and keeps content
    (1 to 9).foreach(_ => IncrementalDedup.appendBatch(spark, idx,
      batch2, "doc_id", "text", shingleN = 2, numHashes = 64, bands = 16))
    val widened = ManifestTable.read(spark, idx).count()
    ManifestTable.compact(spark, idx, maxDirs = 2)
    assert(ManifestTable.read(spark, idx).count() == widened)
    ManifestTable.vacuum(spark, idx, keepVersions = 1)
    assert(ManifestTable.read(spark, idx).count() == widened && widened > total)
  }
}
