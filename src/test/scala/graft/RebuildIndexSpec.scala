package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{Bm25Index, IvfIndex, PqIndex}
import graft.sinks.ManifestTable

/** `GRAFT REBUILD INDEX` — the atomic form of the old "DROP + CREATE"
  * remedy (VERDICT r16 What's-missing #3). Contract pinned here:
  *
  *  - the rebuilt index answers EXACTLY like a fresh first-sync over
  *    the same corpus snapshot (training is deterministic, so this is
  *    bit-for-bit, not approximate);
  *  - the swap is ONE manifest commit carrying the new sync watermark
  *    AND the model-generation pointer, so the index keeps answering
  *    throughout and a reader's pinned manifest resolves a CONSISTENT
  *    (model, lists) pair;
  *  - rebuild is the escape hatch sync's non-append refusal names: a
  *    rewritten/deleted corpus that sync refuses folds cleanly through
  *    a rebuild, and later syncs continue INCREMENTALLY from it;
  *  - the balance WARN's remedy works: a piled-up index rebuilds to
  *    a healthy occupancy without ever losing its definition.
  */
class RebuildIndexSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = s"${Files.createTempDirectory("graft-rebuild")}/t"

  private def clustered(n: Int, spread: Int): Seq[(Long, Array[Float])] =
    (0L until n.toLong).map { i =>
      (i, Array.tabulate(16)(d =>
        (math.sin(i * 16 + d) * spread +
          (if (d % 4 == i % 4) 5 else 0)).toFloat))
    }

  test("ivf rebuild: retrain + reassign in one atomic swap; search ≡ fresh first-sync; generation bumps; sync continues incrementally") {
    val corpus = tmp(); val idx = tmp()
    ManifestTable.write(clustered(80, 3).toDF("vec_id", "embedding"),
      corpus, "vec_id", 2)
    assert(IvfIndex.sync(spark, idx, corpus, "vec_id", "embedding",
      k = 4, nBuckets = 4))
    // skew the index: a pile of near-duplicates of one member, assigned
    // with the FROZEN centroids, lands in one list (the balance WARN's
    // fixture shape)
    val seed = clustered(1, 3).head._2
    ManifestTable.append(spark, corpus,
      (1000L until 1400L).map(i =>
        (i, seed.map(x => x + 0.001f * ((i % 7) - 3))))
        .toDF("vec_id", "embedding"), "vec_id")
    assert(IvfIndex.sync(spark, idx, corpus, "vec_id", "embedding"))
    def balance() = spark.sql(s"GRAFT VERIFY '$idx' DEEP").collect()
      .find(_.getString(1) == "index_balance").get
    assert(balance().getString(2) == "WARN",
      s"fixture must skew the frozen-centroid index: ${balance().getString(3)}")
    assert(balance().getString(3).contains("GRAFT REBUILD INDEX"),
      "the WARN must name the atomic remedy")
    assert(IvfIndex.generation(spark, idx) == 0L, "legacy layout is gen 0")

    // THE REMEDY — via the SQL verb
    val out = spark.sql(s"GRAFT REBUILD INDEX '$idx'").collect().head
    assert(out.getString(1) == "rebuild_index")
    assert(IvfIndex.generation(spark, idx) == 1L,
      "rebuild must bump the model generation")
    assert(graft.ops.IndexAudit.isIndex(spark, idx),
      "the definition must survive the rebuild")
    // the operator can SEE the rebuild in DESCRIBE's vitals
    assert(spark.sql(s"GRAFT DESCRIBE '$idx'").collect()
      .head.getString(13).contains("model_gen=1"),
      "DESCRIBE must surface the bumped model generation")

    // rebuilt ≡ a FRESH first-sync over the same corpus (deterministic
    // training ⇒ bit-identical search AND bit-identical balance: any
    // skew remaining after the rebuild is the DATA's — a 400-near-dup
    // blob is one k-means cluster however often you retrain — exactly
    // what DROP + CREATE would have produced, minus the outage window)
    val fresh = tmp()
    assert(IvfIndex.sync(spark, fresh, corpus, "vec_id", "embedding",
      k = 4, nBuckets = 4))
    def balanceDetail(p: String) = spark.sql(s"GRAFT VERIFY '$p' DEEP")
      .collect().find(_.getString(1) == "index_balance").get.getString(3)
    assert(balanceDetail(idx).takeWhile(_ != '—') ==
      balanceDetail(fresh).takeWhile(_ != '—'),
      s"rebuilt occupancy must equal a fresh build's: " +
        s"${balanceDetail(idx)} vs ${balanceDetail(fresh)}")
    val queries = ManifestTable.read(spark, corpus).filter($"vec_id" < 3)
    def rows(p: String) = IvfIndex.search(spark, p, queries,
        "vec_id", "embedding", k = 5, nProbe = 2, queryBound = 3L)
      .withColumn("sim_r", round($"sim", 9))
      .select("query_id", "neighbor_id", "sim_r", "rank")
      .collect().map(_.toString).sorted.toSeq
    assert(rows(idx) == rows(fresh),
      "rebuilt index must answer exactly like a fresh first-sync")

    // VERIFY stays clean end to end (model load, recall, freshness)
    val vfy = spark.sql(s"GRAFT VERIFY '$idx'").collect()
      .filter(_.getString(2) == "FAIL")
    assert(vfy.isEmpty, s"VERIFY FAIL rows after rebuild: ${vfy.toSeq}")

    // later syncs continue INCREMENTALLY from the rebuilt watermark
    ManifestTable.append(spark, corpus,
      clustered(2000, 3).take(5).map { case (i, v) => (i + 5000L, v) }
        .toDF("vec_id", "embedding"), "vec_id")
    assert(IvfIndex.sync(spark, idx, corpus, "vec_id", "embedding"),
      "post-rebuild sync must fold the delta")
    assert(ManifestTable.read(spark, s"$idx/lists").count() ==
      ManifestTable.read(spark, corpus).count(),
      "post-rebuild incremental sync must reach full inventory")
    assert(IvfIndex.generation(spark, idx) == 1L,
      "incremental sync must not move the generation")

    // LISTS k retrains with a different list count — the skew remedy
    // often wants more lists than the first build chose
    spark.sql(s"GRAFT REBUILD INDEX '$idx' LISTS 8").collect()
    assert(IvfIndex.nLists(spark, idx) == 8,
      "LISTS override must retrain with the requested list count")
    assert(IvfIndex.generation(spark, idx) == 2L)
    assert(IvfIndex.search(spark, idx, queries, "vec_id", "embedding",
      k = 5, nProbe = 2, queryBound = 3L).count() > 0,
      "the re-listed index must answer")
  }

  test("RESTORE of a rebuilt index's lists travels WITH its generation: pre-rebuild pointers resolve the pre-rebuild model") {
    val corpus = tmp(); val idx = tmp()
    ManifestTable.write(clustered(80, 3).toDF("vec_id", "embedding"),
      corpus, "vec_id", 2)
    assert(IvfIndex.sync(spark, idx, corpus, "vec_id", "embedding",
      k = 4, nBuckets = 4))
    val queries = ManifestTable.read(spark, corpus).filter($"vec_id" < 3)
    def rows() = IvfIndex.search(spark, idx, queries,
        "vec_id", "embedding", k = 5, nProbe = 2, queryBound = 3L)
      .withColumn("sim_r", round($"sim", 9))
      .select("query_id", "neighbor_id", "sim_r", "rank")
      .collect().map(_.toString).sorted.toSeq
    val preRebuild = rows()
    val preVersion = ManifestTable.headVersion(spark, s"$idx/lists").get
    // retrain with a DIFFERENT list count so the generations' models
    // provably differ — a torn (old lists, new model) pair could not
    // reproduce the pre-rebuild answers
    spark.sql(s"GRAFT REBUILD INDEX '$idx' LISTS 8").collect()
    assert(rows() != preRebuild || IvfIndex.nLists(spark, idx) == 8,
      "fixture sanity: the rebuild changed the model")
    // the fix under test: restore() keeps head txns (watermarks) but
    // the GENERATION pointer is a data pointer — it must come from the
    // RESTORED version, or searches would decode old list assignments
    // against the new model (silent garbage, VERDICT-review finding)
    spark.sql(s"GRAFT RESTORE '$idx/lists' TO VERSION $preVersion")
      .collect()
    assert(IvfIndex.generation(spark, idx) == 0L,
      "restored lists must resolve the generation they were assigned " +
        "under")
    assert(rows() == preRebuild,
      "post-restore search must reproduce the pre-rebuild answers " +
        "bit-for-bit (consistent (model, lists) pair)")
    assert(!spark.sql(s"GRAFT VERIFY '$idx'").collect()
      .exists(_.getString(2) == "FAIL"))
  }

  test("MAINTAIN reclaims superseded model generations under the lists table's retention; in-flight shadows survive") {
    val corpus = tmp(); val idx = tmp()
    ManifestTable.write(clustered(60, 3).toDF("vec_id", "embedding"),
      corpus, "vec_id", 2)
    assert(IvfIndex.sync(spark, idx, corpus, "vec_id", "embedding",
      k = 4, nBuckets = 4))
    // two rebuilds → generations 1 and 2; appends roll the retained
    // version window forward so older generations drop out of it
    IvfIndex.rebuild(spark, idx)
    ManifestTable.append(spark, corpus,
      Seq((500L, clustered(1, 3).head._2)).toDF("vec_id", "embedding"),
      "vec_id")
    assert(IvfIndex.sync(spark, idx, corpus, "vec_id", "embedding"))
    IvfIndex.rebuild(spark, idx)
    assert(IvfIndex.generation(spark, idx) == 2L)
    def dirs() = new java.io.File(idx).listFiles()
      .map(_.getName).filter(_.startsWith("_centroids")).sorted.toSeq
    def claims() = new java.io.File(idx).listFiles()
      .map(_.getName).filter(_.endsWith(".claim")).sorted.toSeq
    assert(dirs() == Seq("_centroids", "_centroids-g1", "_centroids-g2"),
      s"both old generations must still be on disk pre-vacuum: ${dirs()}")
    assert(claims() == Seq("_gen-1.claim", "_gen-2.claim"),
      s"each rebuild must hold its generation claim: ${claims()}")
    // a FUTURE generation dir is an in-flight rebuild's shadow — the
    // vacuum must never race it
    java.nio.file.Files.createDirectory(
      java.nio.file.Paths.get(idx, "_centroids-g99"))

    val rows = graft.ops.IndexAudit.maintainIndex(spark, idx,
      maxVersions = 1, keepVersions = 1)
    assert(rows.exists(_._1.action == "vacuum-models"),
      s"maintain must report the model vacuum: ${rows.map(_._1)}")
    assert(dirs() == Seq("_centroids-g2", "_centroids-g99"),
      s"superseded generations reclaimed, current + shadow kept: ${dirs()}")
    assert(claims() == Seq("_gen-2.claim"),
      s"a superseded generation's claim marker goes with it: ${claims()}")
    // the index still answers and audits clean on the current generation
    val q = ManifestTable.read(spark, corpus).filter($"vec_id" < 2)
    assert(IvfIndex.search(spark, idx, q, "vec_id", "embedding",
      k = 3, nProbe = 2, queryBound = 2L).count() > 0)
    assert(!spark.sql(s"GRAFT VERIFY '$idx'").collect()
      .exists(_.getString(2) == "FAIL"))
    // a second maintain finds nothing left to reclaim (fixpoint)
    assert(!graft.ops.IndexAudit.maintainIndex(spark, idx,
      maxVersions = 1, keepVersions = 1)
      .exists(_._1.action == "vacuum-models"),
      "model vacuum must be a fixpoint")
  }

  test("bm25 rebuild: the escape hatch sync's non-append refusal names — a rewritten corpus folds through rebuild; stats exact") {
    val corpus = tmp(); val idx = tmp()
    val docs = (0L until 40L).map(i =>
      (i, s"alpha w${i % 7} common tail${i % 3}"))
    ManifestTable.write(docs.toDF("doc_id", "text"), corpus, "doc_id", 2)
    assert(Bm25Index.sync(spark, idx, corpus, "doc_id", "text",
      nBuckets = 4))
    // corpus REWRITE (keyed update): postings cannot subtract — sync
    // must refuse and name the remedy
    ManifestTable.upsert(spark, corpus,
      Seq((0L, "zeta zeta zeta")).toDF("doc_id", "text"), "doc_id")
    val e = intercept[IllegalArgumentException](
      Bm25Index.sync(spark, idx, corpus, "doc_id", "text"))
    assert(e.getMessage.contains("GRAFT REBUILD INDEX"),
      s"refusal must name the verb: ${e.getMessage}")

    assert(Bm25Index.rebuild(spark, idx) ==
      ManifestTable.headVersion(spark, corpus).get)
    // the rebuilt index ≡ a fresh build over the current corpus
    val fresh = tmp()
    Bm25Index.build(spark, fresh, ManifestTable.read(spark, corpus),
      "doc_id", "text", nBuckets = 4)
    val qterms = Seq("zeta", "common", "w1").toDF("term")
    def res(p: String) = Bm25Index.search(spark, p, qterms, k = 50)
      .as[(Long, Long, Double)].collect().toSet
    assert(res(idx) == res(fresh),
      "rebuilt postings must equal a fresh build over the rewritten corpus")
    // the old doc 0 postings are GONE (the whole point of the rebuild)
    assert(ManifestTable.read(spark, s"$idx/postings")
      .filter($"term" === "alpha" && $"doc_id" === 0L).count() == 0L,
      "rewritten-away postings must not survive the rebuild")
    // stats reflect the rebuilt corpus exactly; sync is quiescent after
    assert(!Bm25Index.sync(spark, idx, corpus, "doc_id", "text"),
      "post-rebuild sync at the same head must be a no-op")
    // and future appends fold incrementally
    ManifestTable.append(spark, corpus,
      Seq((100L, "common omega")).toDF("doc_id", "text"), "doc_id")
    assert(Bm25Index.sync(spark, idx, corpus, "doc_id", "text"))
    assert(res(idx) != res(fresh), "the delta must be searchable")
  }

  test("ivfpq rebuild: both models swap with the lists in one commit; search ≡ fresh first-sync; verb dispatches by kind") {
    val corpus = tmp(); val idx = tmp()
    ManifestTable.write(clustered(60, 3).toDF("vec_id", "embedding"),
      corpus, "vec_id", 2)
    assert(PqIndex.sync(spark, idx, corpus, "vec_id", "embedding",
      kLists = 2, m = 4, k = 8, nBuckets = 2))
    ManifestTable.append(spark, corpus,
      clustered(80, 3).drop(60).map { case (i, v) => (i + 100L, v) }
        .toDF("vec_id", "embedding"), "vec_id")
    assert(PqIndex.sync(spark, idx, corpus, "vec_id", "embedding"))

    val queries = ManifestTable.read(spark, corpus).filter($"vec_id" < 3)
    def rows(p: String) = PqIndex.search(spark, p, queries,
        "vec_id", "embedding", topK = 5, nProbe = 2, queryBound = 3L)
      .select("query_id", "neighbor_id", "dist", "rank")
      .collect().map(_.toString).sorted.toSeq

    // a search INSIDE the rebuild window must see exactly the pre-swap
    // (coarse, codebooks, lists) TRIPLE — ADC distances decode codes
    // against codebooks, so a torn pair would CHANGE values, not just
    // rankings; the pinned-manifest read makes bit-equality the only
    // legal answer
    val preSwap = rows(idx)
    var fired = false
    Bm25Index.withSyncMidHook(() =>
      if (!fired) { fired = true
        assert(rows(idx) == preSwap,
          "a mid-rebuild ivfpq search must equal the pre-swap answer " +
            "bit-for-bit (consistent model/lists triple)") }) {
      spark.sql(s"GRAFT REBUILD INDEX '$idx'").collect()
    }
    assert(fired, "the walk seam must fire inside the rebuild")

    val fresh = tmp()
    assert(PqIndex.sync(spark, fresh, corpus, "vec_id", "embedding",
      kLists = 2, m = 4, k = 8, nBuckets = 2))
    assert(rows(idx) == rows(fresh),
      "rebuilt ivfpq must answer exactly like a fresh first-sync " +
        "(both models retrained at the head, lists re-encoded)")
    assert(!spark.sql(s"GRAFT VERIFY '$idx'").collect()
      .exists(_.getString(2) == "FAIL"))
    // the legacy-generation model dirs still exist but are unreferenced
    // (vacuumable); the def survived
    assert(graft.ops.IndexAudit.isIndex(spark, idx))
  }

  test("a REFUSED whole-table write leaves zero new files under the table root (VERDICT r17 #1)") {
    def ls(p: String): Set[String] = {
      def walk(f: java.io.File): Seq[String] =
        if (f.isDirectory) f.listFiles.toSeq.flatMap(walk) :+ f.getPath
        else Seq(f.getPath)
      val root = new java.io.File(p)
      if (root.exists) walk(root).toSet else Set.empty
    }
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    // fresh root: the staging runs before the expectTxn guard, so the
    // refusal must remove everything it created — including the root
    // itself (a DROP racing a rebuild must win with NOTHING left)
    val fresh = tmp()
    intercept[IllegalStateException] {
      ManifestTable.writeWithTxns(df, fresh, "id", 2, Map.empty,
        expectTxn = Some(("gen", 7L)))
    }
    assert(!new java.io.File(fresh).exists,
      "a refused write on a fresh root must leave nothing behind")
    // existing table: the refusal must leave the file set untouched
    val existing = tmp()
    ManifestTable.write(df, existing, "id", 2)
    val before = ls(existing)
    intercept[IllegalStateException] {
      ManifestTable.writeWithTxns(df, existing, "id", 2, Map.empty,
        expectTxn = Some(("gen", 7L)))
    }
    assert(ls(existing) == before,
      "a refused write must add zero files under an existing table root")
  }

  test("racing rebuilds claim DISTINCT generations — the loser's refusal cleanup never touches the winner's committed model (ADVICE r17)") {
    val corpus = tmp(); val idx = tmp()
    ManifestTable.write(clustered(80, 3).toDF("vec_id", "embedding"),
      corpus, "vec_id", 2)
    assert(IvfIndex.sync(spark, idx, corpus, "vec_id", "embedding",
      k = 4, nBuckets = 4))
    assert(IvfIndex.generation(spark, idx) == 0L)
    // a FULL second rebuild runs inside the first's window (the shared
    // walk seam): without create-exclusive generation claims both
    // attempts allocate g=1 — the inner one commits centroids-g1, the
    // outer overwrites then REFUSES, and its cleanup deletes the dir
    // the committed manifest references (the r17 ADVICE scenario).
    var fired = false
    val e = intercept[IllegalStateException] {
      Bm25Index.withSyncMidHook(() => if (!fired) { fired = true
        assert(spark.sql(s"GRAFT REBUILD INDEX '$idx'").collect()
          .head.getString(1) == "rebuild_index") }) {
        IvfIndex.rebuild(spark, idx)
      }
    }
    assert(fired, "the inner rebuild must have run inside the window")
    assert(e.getMessage.contains("racing rebuild"),
      s"the outer rebuild must refuse loudly: ${e.getMessage}")
    // the outer attempt claimed g=1 BEFORE the seam, so the inner one
    // claim-probed past it to g=2 and committed that
    assert(IvfIndex.generation(spark, idx) == 2L,
      "the winner's committed generation survives the loser's refusal")
    assert(new java.io.File(IvfIndex.centroidsDirAt(idx, 2L)).exists,
      "the committed model dir must survive the loser's cleanup")
    assert(!new java.io.File(IvfIndex.centroidsDirAt(idx, 1L)).exists &&
      !new java.io.File(IvfIndex.genClaimPath(idx, 1L)).exists,
      "the loser's own shadow dir and claim must be reclaimed")
    // the index answers — exactly like a fresh build over the snapshot
    val q = ManifestTable.read(spark, corpus).filter($"vec_id" < 3)
    val fresh = tmp()
    assert(IvfIndex.sync(spark, fresh, corpus, "vec_id", "embedding",
      k = 4, nBuckets = 4))
    def rows(p: String) = IvfIndex.search(spark, p, q,
        "vec_id", "embedding", k = 5, nProbe = 2, queryBound = 3L)
      .withColumn("sim_r", round($"sim", 9))
      .select("query_id", "neighbor_id", "sim_r", "rank")
      .collect().map(_.toString).sorted.toSeq
    assert(rows(idx) == rows(fresh),
      "the surviving index must answer exactly like a fresh first-sync")
    assert(!spark.sql(s"GRAFT VERIFY '$idx'").collect()
      .exists(_.getString(2) == "FAIL"))
  }

  test("GRAFT MAINTAIN racing a rebuild's training window: the in-flight claim below the winner's committed generation survives; the winner's model is untouched") {
    val corpus = tmp(); val idx = tmp()
    ManifestTable.write(clustered(80, 3).toDF("vec_id", "embedding"),
      corpus, "vec_id", 2)
    assert(IvfIndex.sync(spark, idx, corpus, "vec_id", "embedding",
      k = 4, nBuckets = 4))
    // the outer (slow) rebuild claims gen 1, then INSIDE its window:
    // (a) a fast rebuild claim-probes past it to gen 2, commits, and
    //     marks its claim committed;
    // (b) GRAFT MAINTAIN runs at the default grace — the retired
    //     position-based vacuum saw gen 1 unreferenced BELOW maxRef=2
    //     and deleted the slow rebuild's claim mid-train, exactly the
    //     collision window claimGen exists to close
    var fired = false
    var claimSurvivedMaintain = false
    val e = intercept[IllegalStateException] {
      Bm25Index.withSyncMidHook(() => if (!fired) { fired = true
        assert(spark.sql(s"GRAFT REBUILD INDEX '$idx'").collect()
          .head.getString(1) == "rebuild_index")
        graft.ops.IndexAudit.maintainIndex(spark, idx) // default grace
        claimSurvivedMaintain =
          new java.io.File(IvfIndex.genClaimPath(idx, 1L)).exists
      }) {
        IvfIndex.rebuild(spark, idx)
      }
    }
    assert(fired, "the inner rebuild + maintain must run inside the window")
    assert(e.getMessage.contains("racing rebuild"),
      s"the outer rebuild must refuse loudly: ${e.getMessage}")
    assert(claimSurvivedMaintain,
      "MAINTAIN inside the window must NOT delete the in-flight claim " +
        "sitting below the winner's committed generation — commit order " +
        "diverges from generation order under racing rebuilds")
    // the winner's committed model survived both the mid-window
    // MAINTAIN and the loser's refusal cleanup
    assert(IvfIndex.generation(spark, idx) == 2L)
    assert(new java.io.File(IvfIndex.centroidsDirAt(idx, 2L)).exists,
      "the committed model dir must survive")
    // the loser's refusal cleanup reclaimed its OWN artifacts — the
    // generation ledger is clean without any vacuum forcing
    assert(!new java.io.File(IvfIndex.centroidsDirAt(idx, 1L)).exists &&
      !new java.io.File(IvfIndex.genClaimPath(idx, 1L)).exists,
      "the loser's shadow and claim go with its refusal")
    assert(graft.ops.IndexAudit.orphanGenArtifacts(spark, idx).isEmpty,
      "no unreferenced generation artifact remains")
    val q = ManifestTable.read(spark, corpus).filter($"vec_id" < 3)
    assert(IvfIndex.search(spark, idx, q, "vec_id", "embedding",
      k = 5, nProbe = 2, queryBound = 3L).count() > 0)
    assert(!spark.sql(s"GRAFT VERIFY '$idx'").collect()
      .exists(_.getString(2) == "FAIL"))
  }

  test("VERIFY DEEP surfaces rebuild residue (orphan staged dirs + unreferenced generations); MAINTAIN reclaims; DEEP clean (VERDICT r17 #6)") {
    val corpus = tmp(); val idx = tmp()
    ManifestTable.write(clustered(60, 3).toDF("vec_id", "embedding"),
      corpus, "vec_id", 2)
    assert(IvfIndex.sync(spark, idx, corpus, "vec_id", "embedding",
      k = 4, nBuckets = 4))
    IvfIndex.rebuild(spark, idx) // gen 1 committed; gen-0 legacy retained
    def residue() = spark.sql(s"GRAFT VERIFY '$idx' DEEP").collect()
      .find(_.getString(1) == "index_residue")
      .getOrElse(fail("DEEP audit must include index_residue"))
    assert(residue().getString(2) == "ok",
      s"clean index must audit residue-free: ${residue().getString(3)}")

    // plant BOTH residue classes: a crashed refused write's staged dir
    // under lists/data, and a crashed rebuild's shadow (dir + claim)
    val staged = java.nio.file.Paths.get(idx, "lists", "data",
      "00000000-dead-beef-0000-000000000000", "b=0")
    java.nio.file.Files.createDirectories(staged)
    java.nio.file.Files.write(staged.resolve("part-orphan.parquet"),
      Array[Byte](1, 2, 3))
    java.nio.file.Files.createDirectory(
      java.nio.file.Paths.get(idx, "_centroids-g9"))
    java.nio.file.Files.createFile(
      java.nio.file.Paths.get(idx, "_gen-9.claim"))

    val warn = residue()
    assert(warn.getString(2) == "WARN",
      s"planted residue must surface: ${warn.getString(3)}")
    assert(warn.getString(3).contains("1 orphaned staged dir(s)") &&
      warn.getString(3).contains("_centroids-g9") &&
      warn.getString(3).contains("GRAFT MAINTAIN"),
      s"the WARN must name both classes and the remedy: ${warn.getString(3)}")

    // MAINTAIN reclaims both (grace 0: the spec's orphans are fresh;
    // production default leaves an in-flight rebuild's shadow alone)
    val rows = graft.ops.IndexAudit.maintainIndex(spark, idx,
      maxVersions = 1, keepVersions = 1, shadowGraceMs = 0L)
    assert(rows.exists(_._1.action == "vacuum-models") &&
      rows.exists(_._1.action == "vacuum-staged"),
      s"maintain must report both reclaims: ${rows.map(_._1)}")
    assert(!java.nio.file.Files.exists(staged.getParent) &&
      !new java.io.File(s"$idx/_centroids-g9").exists &&
      !new java.io.File(s"$idx/_gen-9.claim").exists,
      "the planted residue must be gone")
    assert(residue().getString(2) == "ok",
      s"post-maintain DEEP must be clean: ${residue().getString(3)}")
    // the live index is untouched: current generation answers, no FAILs
    val q = ManifestTable.read(spark, corpus).filter($"vec_id" < 2)
    assert(IvfIndex.search(spark, idx, q, "vec_id", "embedding",
      k = 3, nProbe = 2, queryBound = 2L).count() > 0)
    assert(!spark.sql(s"GRAFT VERIFY '$idx'").collect()
      .exists(_.getString(2) == "FAIL"))
  }

  test("a NEVER-COMMITTED index root (crashed first build) audits its residue — no crash — and MAINTAIN reclaims it (VERDICT r18 next #5)") {
    val corpus = tmp(); val idx = tmp()
    ManifestTable.write(clustered(60, 3).toDF("vec_id", "embedding"),
      corpus, "vec_id", 2)
    assert(IvfIndex.sync(spark, idx, corpus, "vec_id", "embedding",
      k = 4, nBuckets = 4))
    // simulate the crash window: the lists commit never became durable
    // (first sync died mid-commit, or a DROP raced a rebuild and the
    // refusal cleanup crashed) — the root holds def + model + a claimed
    // shadow, and NO committed manifest references any generation.
    // Before r19 this exact root reported `index_residue: ok`.
    def rmrf(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmrf)
      f.delete()
    }
    rmrf(new java.io.File(s"$idx/lists"))
    java.nio.file.Files.createDirectory(
      java.nio.file.Paths.get(idx, "_centroids-g9"))
    java.nio.file.Files.createFile(
      java.nio.file.Paths.get(idx, "_gen-9.claim"))

    val rows = spark.sql(s"GRAFT VERIFY '$idx' DEEP").collect()
    val residue = rows.find(_.getString(1) == "index_residue")
      .getOrElse(fail(s"DEEP must still include index_residue: " +
        s"${rows.map(_.getString(1)).toSeq}"))
    assert(residue.getString(2) == "WARN" &&
      residue.getString(3).contains("_centroids"),
      s"every on-disk generation of a never-committed root is residue: " +
        s"${residue.getString(3)}")
    assert(rows.exists(r => r.getString(1) == "lists:manifest" &&
      r.getString(2) == "FAIL"),
      s"the missing manifest must surface as a FAIL row, not a crash: " +
        s"${rows.map(r => (r.getString(1), r.getString(2))).toSeq}")

    // MAINTAIN (operator-forced grace) reclaims every generation
    // artifact — nothing committed references them
    val acts = graft.ops.IndexAudit.maintainIndex(spark, idx,
      shadowGraceMs = 0L)
    assert(acts.exists(_._1.action == "vacuum-models"),
      s"maintain must report the reclaim: ${acts.map(_._1)}")
    assert(!new java.io.File(s"$idx/_centroids").exists &&
      !new java.io.File(s"$idx/_centroids-g9").exists &&
      !new java.io.File(s"$idx/_gen-9.claim").exists,
      "no generation artifact may survive under a never-committed root")
    val after = spark.sql(s"GRAFT VERIFY '$idx' DEEP").collect()
      .find(_.getString(1) == "index_residue").get
    assert(after.getString(2) == "ok",
      s"post-maintain residue must be clean: ${after.getString(3)}")
  }

  test("vacuum-models never deletes a pre-shadow claim above maxRef: a retrain longer than the grace keeps its generation (ADVICE r18)") {
    val corpus = tmp(); val idx = tmp()
    ManifestTable.write(clustered(60, 3).toDF("vec_id", "embedding"),
      corpus, "vec_id", 2)
    assert(IvfIndex.sync(spark, idx, corpus, "vec_id", "embedding",
      k = 4, nBuckets = 4)) // gen 0 committed and referenced
    // an in-flight rebuild claimed gen 1 and is STILL TRAINING: the
    // claim is its ONLY on-disk artifact, and a claim's mtime never
    // advances — age it past the grace to model a long retrain
    val claim = new java.io.File(s"$idx/_gen-1.claim")
    java.nio.file.Files.createFile(claim.toPath)
    val old = System.currentTimeMillis() - 2 * 3600L * 1000
    assert(claim.setLastModified(old))
    graft.ops.IndexAudit.maintainIndex(spark, idx) // default 1 h grace
    assert(claim.exists,
      "a claim with no shadow dir is a live retrain's allocation — " +
        "deleting it would let a third rebuild re-claim the same " +
        "generation (the same-g collision claimGen prevents)")
    // training finishes: the shadow dir lands, then the rebuild crashes
    // before committing — once claim AND shadow are BOTH stale, the
    // generation reclaims as a group
    val shadow = new java.io.File(s"$idx/_centroids-g1")
    java.nio.file.Files.createDirectory(shadow.toPath)
    val part = new java.io.File(shadow, "stale.bin")
    java.nio.file.Files.write(part.toPath, Array[Byte](1))
    graft.ops.IndexAudit.maintainIndex(spark, idx)
    assert(claim.exists && shadow.exists,
      "a FRESH shadow is an in-flight rebuild's — the grace protects it")
    assert(part.setLastModified(old) && shadow.setLastModified(old))
    graft.ops.IndexAudit.maintainIndex(spark, idx)
    assert(!claim.exists && !shadow.exists,
      "a stale claim+shadow group is a crashed rebuild's residue")
    // the committed generation is untouched throughout
    assert(new java.io.File(s"$idx/_centroids").exists)
    assert(!spark.sql(s"GRAFT VERIFY '$idx'").collect()
      .exists(_.getString(2) == "FAIL"))
  }

  test("a crash-looping retrain's claim-only generations reclaim past the claim TTL; a commit racing the vacuum's snapshot is never reclaimed") {
    val corpus = tmp(); val idx = tmp()
    ManifestTable.write(clustered(60, 3).toDF("vec_id", "embedding"),
      corpus, "vec_id", 2)
    assert(IvfIndex.sync(spark, idx, corpus, "vec_id", "embedding",
      k = 4, nBuckets = 4)) // gen 0 committed and referenced
    // a retrain that crash-loops BEFORE its shadow lands leaks one
    // claim per attempt; the claim TTL bounds the leak — a week-old
    // claim is residue (no plausible retrain), a fresh one is not
    val leaked = new java.io.File(s"$idx/_gen-1.claim")
    java.nio.file.Files.createFile(leaked.toPath)
    assert(leaked.setLastModified(
      System.currentTimeMillis() - 8L * 24 * 3600 * 1000))
    def residue() = spark.sql(s"GRAFT VERIFY '$idx' DEEP").collect()
      .find(_.getString(1) == "index_residue").get
    assert(residue().getString(2) == "WARN" &&
      residue().getString(3).contains("_gen-1.claim"),
      s"a TTL-expired claim is residue: ${residue().getString(3)}")
    graft.ops.IndexAudit.maintainIndex(spark, idx) // default grace
    assert(!leaked.exists,
      "a TTL-expired claim-only generation reclaims at default grace")
    assert(residue().getString(2) == "ok",
      s"the operator loop converges: ${residue().getString(3)}")
    // a generation whose claim reads COMMITTED but sits ABOVE the
    // newest referenced one is a retrain that finished AFTER the
    // vacuum snapshotted its referenced set (it is head-referenced by
    // now) — the fast path must NOT touch it, fresh or not
    java.nio.file.Files.write(
      java.nio.file.Paths.get(idx, "_gen-5.claim"),
      "committed".getBytes("UTF-8"))
    val racedDir = new java.io.File(s"$idx/_centroids-g5")
    java.nio.file.Files.createDirectory(racedDir.toPath)
    java.nio.file.Files.write(racedDir.toPath.resolve("model.bin"),
      Array[Byte](1))
    graft.ops.IndexAudit.maintainIndex(spark, idx) // default grace
    assert(new java.io.File(s"$idx/_gen-5.claim").exists &&
      racedDir.exists,
      "a committed claim above maxRef is a mid-vacuum commit race — " +
        "reclaiming it would delete the live head model")
  }

  test("a slower rebuild's uncommitted generation BELOW a committed winner survives the vacuum; the commit mark reclaims superseded gens instantly") {
    val corpus = tmp(); val idx = tmp()
    ManifestTable.write(clustered(60, 3).toDF("vec_id", "embedding"),
      corpus, "vec_id", 2)
    assert(IvfIndex.sync(spark, idx, corpus, "vec_id", "embedding",
      k = 4, nBuckets = 4)) // gen 0 committed and referenced
    // a SLOW retrain claims gen 1 and is still training — the claim is
    // its only artifact, aged past the grace (claim mtimes never move)
    val claim1 = new java.io.File(s"$idx/_gen-1.claim")
    java.nio.file.Files.createFile(claim1.toPath)
    val old = System.currentTimeMillis() - 2 * 3600L * 1000
    assert(claim1.setLastModified(old))
    // an uncommitted claim-only allocation is NOT residue: the vacuum
    // (by design) never reclaims it, so a WARN would never clear —
    // detection must agree with reclaim or the operator loop
    // WARN → MAINTAIN → clean wedges open
    val res0 = spark.sql(s"GRAFT VERIFY '$idx' DEEP").collect()
      .find(_.getString(1) == "index_residue").get
    assert(res0.getString(2) == "ok",
      s"a live allocation must not WARN forever: ${res0.getString(3)}")
    // a FASTER rebuild probes past the held claim and commits gen 2:
    // the slow retrain's generation now sits BELOW the committed one —
    // the regime where position-based vacuuming deleted it mid-train
    IvfIndex.rebuild(spark, idx)
    assert(IvfIndex.generation(spark, idx) == 2L,
      "the winner must claim past the held generation")
    graft.ops.IndexAudit.maintainIndex(spark, idx) // default 1 h grace
    assert(claim1.exists,
      "an uncommitted claim below the winner's committed generation " +
        "is a live retrain's — deleting it mid-train kills the retrain " +
        "the grace discipline protects")
    // the slow retrain finishes: its shadow lands FRESH — still an
    // in-flight group (it is about to learn its commit is refused)
    val shadow1 = new java.io.File(s"$idx/_centroids-g1")
    java.nio.file.Files.createDirectory(shadow1.toPath)
    val part1 = new java.io.File(shadow1, "stale.bin")
    java.nio.file.Files.write(part1.toPath, Array[Byte](1))
    graft.ops.IndexAudit.maintainIndex(spark, idx)
    assert(claim1.exists && shadow1.exists,
      "a fresh shadow below the committed generation is protected too")
    // it crashed before its (refused) commit: once the WHOLE group is
    // stale it reclaims — crashed residue, not in-flight work
    assert(part1.setLastModified(old) && shadow1.setLastModified(old))
    graft.ops.IndexAudit.maintainIndex(spark, idx)
    assert(!claim1.exists && !shadow1.exists,
      "a stale uncommitted claim+shadow group below maxRef is residue")
    // the WINNER's claim carries the commit mark: once retention drops
    // its lists versions, the superseded generation reclaims
    // IMMEDIATELY even with fresh mtimes — committed means nobody is
    // still training toward it
    ManifestTable.append(spark, corpus,
      Seq((500L, clustered(1, 3).head._2)).toDF("vec_id", "embedding"),
      "vec_id")
    assert(IvfIndex.sync(spark, idx, corpus, "vec_id", "embedding"))
    IvfIndex.rebuild(spark, idx)
    assert(IvfIndex.generation(spark, idx) == 3L)
    graft.ops.IndexAudit.maintainIndex(spark, idx,
      maxVersions = 1, keepVersions = 1) // default grace — no forcing
    assert(!new java.io.File(s"$idx/_centroids-g2").exists &&
      !new java.io.File(s"$idx/_gen-2.claim").exists,
      "a superseded COMMITTED generation reclaims without waiting out " +
        "the grace — its claim is marked at commit")
    assert(new java.io.File(s"$idx/_centroids-g3").exists &&
      new java.io.File(s"$idx/_gen-3.claim").exists,
      "the live generation and its claim survive")
    // the index answers, audits residue-free, and has no FAILs
    val q = ManifestTable.read(spark, corpus).filter($"vec_id" < 2)
    assert(IvfIndex.search(spark, idx, q, "vec_id", "embedding",
      k = 3, nProbe = 2, queryBound = 2L).count() > 0)
    // the GENERATION ledger is clean (fresh retention-trimmed staged
    // dirs may still WARN until their own grace passes — that half is
    // the staged vacuum's, not this lifecycle's)
    assert(graft.ops.IndexAudit.orphanGenArtifacts(spark, idx).isEmpty,
      "no unreferenced generation artifact may survive")
    assert(!spark.sql(s"GRAFT VERIFY '$idx' DEEP").collect()
      .exists(_.getString(2) == "FAIL"))
  }
}
