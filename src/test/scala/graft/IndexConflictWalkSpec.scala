package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{Bm25Index, PqIndex}
import graft.sinks.ManifestTable

/** Seeded random-schedule concurrency walk for the INDEX layer — the
  * row-level walk's discipline applied to `Bm25Index.sync` /
  * `PqIndex.sync` / `GRAFT MAINTAIN` racing corpus appends. Each step
  * draws a schedule: corpus appends landing BEFORE a sync, INSIDE a
  * sync's head-pin→commit window (via [[Bm25Index.syncMidHook]] — a
  * sync that pinned head v then sees v+1 land must index exactly
  * through v and leave v+1 for the next pass), under `GRAFT MAINTAIN`'s
  * refresh+layout pass, racing double-syncs, or with the index
  * deliberately left stale. Invariants asserted on EVERY schedule:
  *
  *  - exactly-once postings/codes: no (doc_id, term) posting dup, no
  *    vec_id coded twice — a replayed or raced sync must fold nothing
  *    twice (the txn-watermark contract);
  *  - watermark monotonicity: the sync watermark never moves backward;
  *  - drain convergence (every 10th step): syncing until quiescent
  *    reaches watermark == corpus head, stats == corpus totals, and
  *    search over the incrementally-raced index ≡ a fresh one-shot
  *    build over the same corpus, bit-for-bit (BM25; PQ compares the
  *    coded row inventory — models are frozen at first sync by
  *    design, so a retrained rebuild is not the oracle there).
  */
class IndexConflictWalkSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = s"${Files.createTempDirectory("graft-idx-walk")}/t"

  test("BM25 index walk: 100 schedules of corpus appends racing sync/MAINTAIN") {
    val rnd = new scala.util.Random(1515)
    val corpus = tmp(); val idx = tmp()
    val postings = s"$idx/postings"
    var nextId = 0L
    def batch(n: Int): DataFrame = {
      val rows = (0 until n).map { _ =>
        val i = nextId; nextId += 1
        // deterministic word soup with tf variety and shared vocab
        (i, s"w${i % 7} w${i % 7} common x${i % 11} t${i % 5} tail${i % 3}")
      }
      rows.toDF("doc_id", "text")
    }
    ManifestTable.write(batch(20), corpus, "doc_id", 2)
    assert(Bm25Index.sync(spark, idx, corpus, "doc_id", "text", nBuckets = 4))
    var lastWm = ManifestTable.txnVersion(spark, postings, Bm25Index.AppId).get

    val qterms = Seq("common", "w1", "t2").toDF("term")
    var midLanded = 0
    var staleSteps = 0
    (1 to 100).foreach { step =>
      var fired = false
      // the seam is thread-scoped (DynamicVariable): installed once per
      // step around the whole action, armed by midAppend
      var pending: () => Unit = () => ()
      def midAppend(n: Int): Unit = {
        pending = () =>
          if (!fired) { fired = true; midLanded += 1
            ManifestTable.append(spark, corpus, batch(n), "doc_id") }
      }
      Bm25Index.withSyncMidHook(() => pending()) {
        rnd.nextInt(7) match {
          case 0 | 1 => // plain append then sync
            ManifestTable.append(spark, corpus, batch(1 + rnd.nextInt(3)),
              "doc_id")
            assert(Bm25Index.sync(spark, idx, corpus, "doc_id", "text"),
              s"step $step: sync over new data must report work")
          case 2 => // append lands INSIDE the sync window
            ManifestTable.append(spark, corpus, batch(1 + rnd.nextInt(2)),
              "doc_id")
            midAppend(1 + rnd.nextInt(2))
            Bm25Index.sync(spark, idx, corpus, "doc_id", "text")
            assert(fired, s"step $step: mid-window hook must have fired")
          case 3 => // MAINTAIN drives refresh + layout upkeep, mid-append racing
            midAppend(1)
            spark.sql(s"GRAFT MAINTAIN '$idx'").collect()
          case 4 => // double sync: the second pass must be a no-op
            ManifestTable.append(spark, corpus, batch(1), "doc_id")
            Bm25Index.sync(spark, idx, corpus, "doc_id", "text")
            assert(!Bm25Index.sync(spark, idx, corpus, "doc_id", "text"),
              s"step $step: quiescent re-sync must fold nothing")
          case _ => // corpus moves, index deliberately left stale
            ManifestTable.append(spark, corpus, batch(1 + rnd.nextInt(2)),
              "doc_id")
            staleSteps += 1
        }
      }

      // ---- invariants on every schedule ----
      val wm = ManifestTable.txnVersion(spark, postings, Bm25Index.AppId).get
      assert(wm >= lastWm,
        s"step $step: watermark moved backward ($lastWm -> $wm)")
      lastWm = wm
      val dups = ManifestTable.read(spark, postings)
        .groupBy("doc_id", "term").count().filter(col("count") > 1).count()
      assert(dups == 0L,
        s"step $step: $dups duplicated (doc, term) postings — a raced " +
          "sync folded a batch twice")

      if (step % 10 == 0) { // drain to quiescence, then the deep oracle
        while (Bm25Index.sync(spark, idx, corpus, "doc_id", "text")) ()
        val head = ManifestTable.headVersion(spark, corpus).get
        assert(ManifestTable.txnVersion(spark, postings, Bm25Index.AppId)
          .get == head.toLong,
          s"step $step: drained watermark must equal corpus head $head")
        lastWm = head.toLong
        val fresh = tmp()
        Bm25Index.build(spark, fresh, ManifestTable.read(spark, corpus),
          "doc_id", "text", nBuckets = 4)
        val raced = Bm25Index.search(spark, idx, qterms, k = 50)
          .as[(Long, Long, Double)].collect().toSet
        val oneShot = Bm25Index.search(spark, fresh, qterms, k = 50)
          .as[(Long, Long, Double)].collect().toSet
        assert(raced == oneShot,
          s"step $step: raced incremental index diverged from one-shot " +
            s"build (missing=${(oneShot -- raced).take(3)} " +
            s"extra=${(raced -- oneShot).take(3)})")
        val nDocs = ManifestTable.read(spark, corpus).count()
        val indexed = ManifestTable.read(spark, postings)
          .select("doc_id").distinct().count()
        assert(indexed == nDocs,
          s"step $step: $indexed docs indexed of $nDocs committed")
      }
    }
    info(s"mid-window appends landed: $midLanded, stale steps: $staleSteps " +
      s"of 100; final corpus ${nextId} docs")
    assert(midLanded >= 15, s"seed exercised only $midLanded mid-window races")
    assert(staleSteps >= 8, s"seed exercised only $staleSteps stale steps")
  }

  test("PQ index walk: 50 schedules — codes exactly-once under racing syncs") {
    val rnd = new scala.util.Random(909)
    val corpus = tmp(); val idx = tmp()
    val lists = s"$idx/lists"
    var nextId = 0L
    def batch(n: Int): DataFrame = {
      val rows = (0 until n).map { _ =>
        val i = nextId; nextId += 1
        (i, Array.tabulate(16)(d =>
          (math.sin(i * 16 + d) * 3 + (if (d % 4 == i % 4) 5 else 0)).toFloat))
      }
      rows.toDF("vec_id", "embedding")
    }
    ManifestTable.write(batch(60), corpus, "vec_id", 2)
    assert(PqIndex.sync(spark, idx, corpus, "vec_id", "embedding",
      kLists = 2, m = 4, k = 8, nBuckets = 2))
    val appId = PqIndex.AppId
    var lastWm = ManifestTable.txnVersion(spark, lists, appId).get

    var midLanded = 0
    (1 to 50).foreach { step =>
      var fired = false
      var pending: () => Unit = () => ()
      Bm25Index.withSyncMidHook(() => pending()) {
        rnd.nextInt(5) match {
          case 0 | 1 => // append then sync
            ManifestTable.append(spark, corpus, batch(2 + rnd.nextInt(3)),
              "vec_id")
            assert(PqIndex.sync(spark, idx, corpus, "vec_id", "embedding"))
          case 2 => // append inside the sync window
            ManifestTable.append(spark, corpus, batch(2), "vec_id")
            pending = () =>
              if (!fired) { fired = true; midLanded += 1
                ManifestTable.append(spark, corpus, batch(2), "vec_id") }
            PqIndex.sync(spark, idx, corpus, "vec_id", "embedding")
            assert(fired, s"step $step: hook must fire")
          case 3 => // MAINTAIN refresh path
            ManifestTable.append(spark, corpus, batch(1), "vec_id")
            spark.sql(s"GRAFT MAINTAIN '$idx'").collect()
          case _ => // stale
            ManifestTable.append(spark, corpus, batch(1), "vec_id")
        }
      }

      val wm = ManifestTable.txnVersion(spark, lists, appId).get
      assert(wm >= lastWm,
        s"step $step: watermark moved backward ($lastWm -> $wm)")
      lastWm = wm
      val dup = ManifestTable.read(spark, lists)
        .groupBy("id").count().filter(col("count") > 1).count()
      assert(dup == 0L,
        s"step $step: $dup vectors coded twice — raced sync double-folded")

      if (step % 10 == 0) {
        while (PqIndex.sync(spark, idx, corpus, "vec_id", "embedding")) ()
        val nVecs = ManifestTable.read(spark, corpus).count()
        val coded = ManifestTable.read(spark, lists).count()
        assert(coded == nVecs,
          s"step $step: $coded vectors coded of $nVecs committed")
        assert(ManifestTable.txnVersion(spark, lists, appId).get ==
          ManifestTable.headVersion(spark, corpus).get.toLong,
          s"step $step: drained watermark must equal corpus head")
        // the drained index answers over the full corpus
        val q = ManifestTable.read(spark, corpus).limit(2)
        assert(PqIndex.search(spark, idx, q, "vec_id", "embedding",
          topK = 3, nProbe = 2).count() == 6L)
      }
    }
    info(s"mid-window appends landed: $midLanded of 50")
    assert(midLanded >= 5, s"seed exercised only $midLanded mid-window races")
  }

  /** VERDICT r17 (r16 next #3): `GRAFT REBUILD INDEX` racing corpus
    * appends, syncs, searches, and DROPs. The rebuild contract under
    * race:
    *
    *  - a rebuild pins the corpus head like a sync; appends landing
    *    inside its window stay un-indexed until the NEXT sync — the
    *    rebuilt index reflects exactly the pinned snapshot;
    *  - searches fired inside the rebuild window are well-formed over
    *    the pre-swap snapshot (the pinned-manifest read: a consistent
    *    (model, lists) pair, contiguous ranks) — the index answers
    *    THROUGHOUT the rebuild, the whole point of the atomic swap;
    *  - a DROP inside the window converges to a CONSISTENT index
    *    (rebuild re-writes the definition after its commit — sync's
    *    documented behavior for the same race), never a torn root;
    *  - a SYNC inside the window re-baselines cleanly: the rebuild's
    *    whole-table replace re-anchors the watermark to ITS pinned
    *    head (a true claim about the replaced content — watermark
    *    monotonicity is a per-APPEND invariant, not a replace one),
    *    the raced sync's appendOnce no-ops or is replaced away, and
    *    draining reaches exactly-once full inventory;
    *  - a SECOND REBUILD inside the window claims a DISTINCT
    *    generation (create-exclusive `_gen-N.claim`): the inner
    *    attempt commits, the outer refuses loudly, and the loser's
    *    cleanup reclaims only its OWN shadow + claim — the winner's
    *    committed model is untouchable by construction;
    *  - exactly-once always: no vector coded twice, and the drained
    *    raced index ≡ a fresh one-shot sync, bit-for-bit.
    */
  test("REBUILD walk: 60 schedules of REBUILD INDEX racing appends/syncs/reads/DROP/rebuilds") {
    val rnd = new scala.util.Random(7171)
    val corpus = tmp(); val idx = tmp()
    val lists = s"$idx/lists"
    var nextId = 0L
    def batch(n: Int): DataFrame = {
      val rows = (0 until n).map { _ =>
        val i = nextId; nextId += 1
        (i, Array.tabulate(16)(d =>
          (math.sin(i * 16 + d) * 3 + (if (d % 4 == i % 4) 5 else 0)).toFloat))
      }
      rows.toDF("vec_id", "embedding")
    }
    ManifestTable.write(batch(60), corpus, "vec_id", 2)
    def syncIt(): Boolean = graft.ops.IvfIndex.sync(spark, idx, corpus,
      "vec_id", "embedding", k = 4, nBuckets = 4)
    assert(syncIt())

    def searchRows(): Seq[(Long, Long, Double, Long)] = {
      val q = ManifestTable.read(spark, corpus).filter($"vec_id" < 2)
      graft.ops.IvfIndex.search(spark, idx, q,
          "vec_id", "embedding", k = 3, nProbe = 2, queryBound = 2L)
        .withColumn("sim_r", round($"sim", 9))
        .select($"query_id", $"neighbor_id", $"sim_r", $"rank")
        .as[(Long, Long, Double, Long)].collect()
        .sortBy(t => (t._1, t._4)).toSeq
    }
    def searchRead(tag: String): Unit = {
      val rows = searchRows()
      assert(rows.nonEmpty, s"$tag: search returned nothing")
      rows.groupBy(_._1).foreach { case (qid, rs) =>
        val ranks = rs.map(_._4).sorted.toSeq
        assert(ranks == (1L to ranks.length.toLong),
          s"$tag: ranks not contiguous for query $qid: $ranks")
      }
    }

    var midAppends = 0; var midReads = 0; var midDrops = 0; var midSyncs = 0
    var midRebuilds = 0
    def failMsgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ failMsgs(x.getCause))
    (1 to 60).foreach { step =>
      var fired = false
      var pending: () => Unit = () => ()
      def arm(body: => Unit): Unit =
        pending = () => if (!fired) { fired = true; body }
      def rebuild(): Unit =
        assert(spark.sql(s"GRAFT REBUILD INDEX '$idx'").collect()
          .head.getString(1) == "rebuild_index")
      Bm25Index.withSyncMidHook(() => pending()) {
        rnd.nextInt(7) match {
          case 0 => // plain append then rebuild: full retrain at head
            ManifestTable.append(spark, corpus, batch(1 + rnd.nextInt(3)),
              "vec_id")
            rebuild()
          case 1 => // append lands INSIDE the rebuild window — the
            // rebuild indexes exactly through its pinned head
            val before = ManifestTable.read(spark, corpus).count()
            arm { midAppends += 1
              ManifestTable.append(spark, corpus, batch(2), "vec_id") }
            rebuild()
            assert(fired, s"step $step: hook must fire")
            assert(ManifestTable.read(spark, lists).count() == before,
              s"step $step: rebuild must reflect exactly the pinned head")
          case 2 => // search inside the rebuild window must see EXACTLY
            // the pre-swap snapshot — the pinned-manifest read's
            // old-or-new contract, pinned as bit-equality (the commit
            // has not happened at the seam, so "old" is the only legal
            // answer; a torn (model, lists) pair would change sims)
            val preSwap = searchRows()
            arm { midReads += 1
              searchRead(s"step $step mid-rebuild")
              assert(searchRows() == preSwap,
                s"step $step: a mid-rebuild search must equal the " +
                  "pre-swap answer bit-for-bit") }
            rebuild()
            assert(fired, s"step $step: hook must fire")
          case 3 => // DROP inside the rebuild window: REFUSE (the
            // commit guard sees the generation pointer vanished and
            // the refusal cleanup removes the shadow — the DROP wins
            // cleanly) or CONVERGE to a consistent index (a
            // never-rebuilt gen-0 index recreates, sync's precedent) —
            // never a torn root either way
            arm { midDrops += 1
              assert(spark.sql(s"GRAFT DROP INDEX '$idx'").collect()
                .head.getString(1) == "drop_index") }
            val converged =
              try { rebuild(); true }
              catch { case e: Exception =>
                def msgs(t: Throwable): Seq[String] =
                  Option(t).toSeq.flatMap(x =>
                    Option(x.getMessage).toSeq ++ msgs(x.getCause))
                assert(msgs(e).exists(_.contains("racing rebuild")),
                  s"step $step: unexpected rebuild failure: $e")
                false
              }
            assert(fired, s"step $step: hook must fire")
            if (converged)
              assert(graft.ops.IndexAudit.isIndex(spark, idx),
                s"step $step: converged rebuild must leave a " +
                  "consistent index")
            else {
              assert(!new java.io.File(idx).exists(),
                s"step $step: a refused rebuild must leave the DROP's " +
                  "result — nothing — not a defless shell")
              // the walk needs its index back for the next steps
              assert(syncIt(), s"step $step: re-sync after refusal")
            }
          case 4 => // a SYNC fires inside the rebuild window (after an
            // append): the replace re-baselines; drains converge below
            ManifestTable.append(spark, corpus, batch(1), "vec_id")
            arm { midSyncs += 1; syncIt() }
            rebuild()
            assert(fired, s"step $step: hook must fire")
          case 5 => // a FULL second REBUILD lands INSIDE the rebuild
            // window: create-exclusive generation claims force the two
            // attempts onto DISTINCT generations — the inner (winner)
            // commits, the outer refuses loudly, and the loser's
            // cleanup only ever touches its OWN artifacts (ADVICE r17:
            // without claims both allocate one g and the loser's
            // refusal deletes the winner's committed model)
            val floor = math.max(graft.ops.IvfIndex.generation(spark, idx),
              graft.ops.IvfIndex.maxOnDiskGen(spark, idx))
            arm { midRebuilds += 1; rebuild() }
            val refused =
              try { rebuild(); false }
              catch { case e: Exception =>
                assert(failMsgs(e).exists(_.contains("racing rebuild")),
                  s"step $step: unexpected rebuild failure: $e")
                true
              }
            assert(fired, s"step $step: hook must fire")
            assert(refused,
              s"step $step: the outer rebuild must lose to the inner " +
                "commit (the inner moved the generation pointer)")
            assert(graft.ops.IndexAudit.isIndex(spark, idx),
              s"step $step: index must stay consistent through the race")
            assert(graft.ops.IvfIndex.generation(spark, idx) == floor + 2,
              s"step $step: the winner's generation (claimed past the " +
                s"loser's) must be committed: " +
                s"${graft.ops.IvfIndex.generation(spark, idx)} vs " +
                s"floor $floor")
            assert(!new java.io.File(
                graft.ops.IvfIndex.centroidsDirAt(idx, floor + 1)).exists &&
              !new java.io.File(
                graft.ops.IvfIndex.genClaimPath(idx, floor + 1)).exists,
              s"step $step: the loser's shadow dir and claim must be " +
                "reclaimed by its own refusal cleanup")
            assert(new java.io.File(
                graft.ops.IvfIndex.centroidsDirAt(idx, floor + 2)).exists,
              s"step $step: the winner's committed model dir must " +
                "survive the loser's cleanup")
          case _ => // corpus moves, index left stale for later steps
            ManifestTable.append(spark, corpus, batch(1 + rnd.nextInt(2)),
              "vec_id")
        }
      }

      // ---- invariants on every schedule ----
      if (new java.io.File(idx).exists())
        assert(graft.ops.IndexAudit.isIndex(spark, idx),
          s"step $step: TORN index root (data without definition)")
      val dup = ManifestTable.read(spark, lists)
        .groupBy("id").count().filter(col("count") > 1).count()
      assert(dup == 0L,
        s"step $step: $dup vectors indexed twice after the race")
      searchRead(s"step $step post-action")

      if (step % 10 == 0) { // drain, then the deep oracle
        while (syncIt()) ()
        assert(ManifestTable.read(spark, lists).count() ==
          ManifestTable.read(spark, corpus).count(),
          s"step $step: drained inventory != corpus")
        assert(ManifestTable.txnVersion(spark, lists,
          graft.ops.IvfIndex.AppId).get ==
          ManifestTable.headVersion(spark, corpus).get.toLong,
          s"step $step: drained watermark must equal corpus head")
        // rebuild-now ≡ fresh first-sync: deterministic retrain over
        // the same snapshot, so the raced-and-rebuilt index and a
        // from-scratch index answer bit-for-bit
        graft.ops.IvfIndex.rebuild(spark, idx)
        val fresh = tmp()
        assert(graft.ops.IvfIndex.sync(spark, fresh, corpus,
          "vec_id", "embedding", k = 4, nBuckets = 4))
        val q = ManifestTable.read(spark, corpus).filter($"vec_id" < 3)
        def rows(p: String) = graft.ops.IvfIndex.search(spark, p, q,
            "vec_id", "embedding", k = 5, nProbe = 2, queryBound = 3L)
          .withColumn("sim_r", round($"sim", 9))
          .select("query_id", "neighbor_id", "sim_r", "rank")
          .collect().map(_.toString).sorted.toSeq
        assert(rows(idx) == rows(fresh),
          s"step $step: raced+rebuilt index diverged from fresh build")
        val failRows = spark.sql(s"GRAFT VERIFY '$idx'").collect()
          .filter(_.getString(2) == "FAIL")
        assert(failRows.isEmpty,
          s"step $step: VERIFY FAIL after drain: ${failRows.toSeq}")
      }
    }
    info(s"mid-window: $midAppends appends, $midReads reads, " +
      s"$midDrops drops, $midSyncs syncs, $midRebuilds rebuilds of 60")
    assert(midAppends >= 5, s"seed exercised only $midAppends mid-appends")
    assert(midReads >= 5, s"seed exercised only $midReads mid-reads")
    assert(midDrops >= 5, s"seed exercised only $midDrops mid-drops")
    assert(midSyncs >= 5, s"seed exercised only $midSyncs mid-syncs")
    assert(midRebuilds >= 5,
      s"seed exercised only $midRebuilds mid-rebuilds")
  }

  /** VERDICT r16 directive #4: `GRAFT DROP INDEX` racing an in-flight
    * sync, and hybrid reads racing syncs of BOTH backing indexes, were
    * untested interleavings. Invariants:
    *
    *  - a DROP landing inside a sync's head-pin→commit window must
    *    CONVERGE CLEANLY: afterwards the index path is either fully
    *    absent or a fully consistent index (the sync, finding the
    *    postings/lists gone, rebuilds from scratch under its pinned
    *    head) — never a torn directory with data but no definition;
    *  - hybrid reads fired INSIDE sync windows (of either index, or
    *    between the two indexes' interleaved syncs) never see a torn
    *    pair: they return well-formed fusions (contiguous per-query
    *    ranks, positive rrf, known query ids) over the pre-commit
    *    snapshot;
    *  - the usual walk contract holds throughout: watermark
    *    monotonicity, exactly-once postings, drained raced index ≡
    *    fresh one-shot build.
    */
  test("DROP + hybrid walk: 50 schedules of DROP INDEX and hybrid reads racing dual-index syncs") {
    import graft.sources.SearchRelations
    val rnd = new scala.util.Random(4242)
    val tCorpus = tmp(); val vCorpus = tmp(); val qtab = tmp()
    val tIdx = tmp(); val vIdx = tmp()
    val postings = s"$tIdx/postings"
    var nextDoc = 0L
    def docBatch(n: Int): DataFrame = {
      val rows = (0 until n).map { _ =>
        val i = nextDoc; nextDoc += 1
        (i, s"w${i % 7} w${i % 7} common x${i % 11} t${i % 5} tail${i % 3}")
      }
      rows.toDF("doc_id", "text")
    }
    var nextVec = 0L
    def vecBatch(n: Int): DataFrame = {
      val rows = (0 until n).map { _ =>
        val i = nextVec; nextVec += 1
        (i, Array.tabulate(16)(d =>
          (math.sin(i * 16 + d) * 3 + (if (d % 4 == i % 4) 5 else 0)).toFloat))
      }
      rows.toDF("vec_id", "embedding")
    }
    ManifestTable.write(docBatch(20), tCorpus, "doc_id", 2)
    val firstVecs = vecBatch(60)
    ManifestTable.write(firstVecs, vCorpus, "vec_id", 2)
    ManifestTable.write(firstVecs.limit(2), qtab, "vec_id", 2)
    def syncT(): Boolean =
      Bm25Index.sync(spark, tIdx, tCorpus, "doc_id", "text", nBuckets = 4)
    def syncV(): Boolean =
      PqIndex.sync(spark, vIdx, vCorpus, "vec_id", "embedding",
        kLists = 2, m = 4, k = 8, nBuckets = 2)
    assert(syncT()); assert(syncV())
    var lastTWm = ManifestTable.txnVersion(spark, postings, Bm25Index.AppId).get

    def hybridRead(tag: String): Unit = {
      val rows = SearchRelations.hybrid(spark, tIdx, vIdx,
          Seq("common", "w1"), qtab, k = 5, nProbe = 2)
        .select($"query_id", $"rank", $"rrf")
        .as[(Long, Long, Double)].collect()
      assert(rows.nonEmpty, s"$tag: hybrid returned nothing")
      val byQ = rows.groupBy(_._1)
      assert(byQ.keySet.subsetOf(Set(0L, 1L)), s"$tag: alien query ids $byQ")
      byQ.foreach { case (q, rs) =>
        val ranks = rs.map(_._2).sorted.toSeq
        assert(ranks == (1L to ranks.length.toLong),
          s"$tag: ranks not contiguous for query $q: $ranks")
        assert(rs.forall(_._3 > 0), s"$tag: non-positive rrf for query $q")
      }
    }
    def assertNotTorn(path: String): Unit = {
      if (new java.io.File(path).exists())
        assert(graft.ops.IndexAudit.isIndex(spark, path),
          s"TORN index at $path: data directory without a definition")
    }

    var midReads = 0; var drops = 0; var dualSyncs = 0
    (1 to 50).foreach { step =>
      var fired = false
      var pending: () => Unit = () => ()
      def arm(body: => Unit): Unit =
        pending = () => if (!fired) { fired = true; body }
      Bm25Index.withSyncMidHook(() => pending()) {
        rnd.nextInt(7) match {
          case 0 => // hybrid read inside the TEXT sync window
            ManifestTable.append(spark, tCorpus, docBatch(1 + rnd.nextInt(2)),
              "doc_id")
            arm { midReads += 1; hybridRead(s"step $step mid-text-sync") }
            syncT()
            assert(fired, s"step $step: hook must fire")
          case 1 => // hybrid read inside the VECTOR sync window
            ManifestTable.append(spark, vCorpus, vecBatch(2), "vec_id")
            arm { midReads += 1; hybridRead(s"step $step mid-vec-sync") }
            syncV()
            assert(fired, s"step $step: hook must fire")
          case 2 => // the two indexes' syncs INTERLEAVE: vIdx syncs
            // inside tIdx's window (the hook re-enters the seam; the
            // fired guard stops recursion), then both drain
            ManifestTable.append(spark, tCorpus, docBatch(1), "doc_id")
            ManifestTable.append(spark, vCorpus, vecBatch(2), "vec_id")
            arm { dualSyncs += 1; syncV() }
            syncT()
            assert(fired, s"step $step: hook must fire")
          case 3 => // DROP INDEX lands inside the text sync's window —
            // the sync pinned head, the index vanishes, the sync must
            // rebuild from scratch under its pinned head (clean
            // convergence), never leave a torn directory
            ManifestTable.append(spark, tCorpus, docBatch(1), "doc_id")
            arm { drops += 1
              assert(spark.sql(s"GRAFT DROP INDEX '$tIdx'").collect()
                .head.getString(1) == "drop_index") }
            syncT()
            assert(fired, s"step $step: hook must fire")
            assert(graft.ops.IndexAudit.isIndex(spark, tIdx),
              s"step $step: sync after mid-window DROP must have rebuilt")
            lastTWm = ManifestTable.txnVersion(spark, postings,
              Bm25Index.AppId).get
          case 4 => // DROP INDEX inside the vector sync's window
            ManifestTable.append(spark, vCorpus, vecBatch(2), "vec_id")
            arm { drops += 1
              assert(spark.sql(s"GRAFT DROP INDEX '$vIdx'").collect()
                .head.getString(1) == "drop_index") }
            syncV()
            assert(fired, s"step $step: hook must fire")
            assert(graft.ops.IndexAudit.isIndex(spark, vIdx),
              s"step $step: sync after mid-window DROP must have rebuilt")
          case _ => // both corpora move; only one index follows
            ManifestTable.append(spark, tCorpus, docBatch(1), "doc_id")
            ManifestTable.append(spark, vCorpus, vecBatch(1), "vec_id")
            syncT()
        }
      }

      // ---- invariants on every schedule ----
      assertNotTorn(tIdx); assertNotTorn(vIdx)
      val wm = ManifestTable.txnVersion(spark, postings, Bm25Index.AppId).get
      assert(wm >= lastTWm,
        s"step $step: text watermark moved backward ($lastTWm -> $wm)")
      lastTWm = wm
      val dups = ManifestTable.read(spark, postings)
        .groupBy("doc_id", "term").count().filter(col("count") > 1).count()
      assert(dups == 0L, s"step $step: duplicated postings after races")
      hybridRead(s"step $step post-action")

      if (step % 10 == 0) { // drain both, then the deep oracles
        while (syncT()) (); while (syncV()) ()
        val failT = spark.sql(s"GRAFT VERIFY '$tIdx'").collect()
          .filter(_.getString(2) == "FAIL")
        val failV = spark.sql(s"GRAFT VERIFY '$vIdx'").collect()
          .filter(_.getString(2) == "FAIL")
        assert(failT.isEmpty && failV.isEmpty,
          s"step $step: VERIFY FAIL rows after drain: " +
            s"${(failT ++ failV).toSeq}")
        val fresh = tmp()
        Bm25Index.build(spark, fresh, ManifestTable.read(spark, tCorpus),
          "doc_id", "text", nBuckets = 4)
        val qterms = Seq("common", "w1", "t2").toDF("term")
        val raced = Bm25Index.search(spark, tIdx, qterms, k = 50)
          .as[(Long, Long, Double)].collect().toSet
        val oneShot = Bm25Index.search(spark, fresh, qterms, k = 50)
          .as[(Long, Long, Double)].collect().toSet
        assert(raced == oneShot,
          s"step $step: raced text index diverged from one-shot build")
        assert(ManifestTable.read(spark, s"$vIdx/lists").count() ==
          ManifestTable.read(spark, vCorpus).count(),
          s"step $step: coded inventory != corpus after drain")
      }
    }
    info(s"mid-sync hybrid reads: $midReads, mid-sync DROPs: $drops, " +
      s"interleaved dual syncs: $dualSyncs of 50")
    assert(drops >= 8, s"seed exercised only $drops mid-window drops")
    assert(midReads >= 8, s"seed exercised only $midReads mid-sync reads")
    assert(dualSyncs >= 4, s"seed exercised only $dualSyncs dual syncs")
  }
}
