package graft

import java.nio.file.{Files, Paths}
import graft.streaming.{DecontamStream, DedupStream, IndexedDedupStream, IngestStream, JoinStream, NearDupStream, PackStream, WindowStream}

/** Minimal in-memory GroupState for driving stateful functions directly.
  * `timedOut` simulates a ProcessingTimeTimeout callback; `nowMs` is the
  * clock the function sees through `getCurrentProcessingTimeMs`.
  */
class FakeGroupState[S](initial: Option[S], timedOut: Boolean = false,
                        nowMs: Long = 0L)
    extends org.apache.spark.sql.streaming.GroupState[S] {
  private var cur: Option[S] = initial
  var lastTimeoutMs: Option[Long] = None
  def updated: Option[S] = cur
  override def exists: Boolean = cur.isDefined
  override def get: S = cur.get
  override def getOption: Option[S] = cur
  override def update(newState: S): Unit = { cur = Some(newState) }
  override def remove(): Unit = { cur = None }
  override def hasTimedOut: Boolean = timedOut
  override def setTimeoutDuration(durationMs: Long): Unit = { lastTimeoutMs = Some(durationMs) }
  override def setTimeoutDuration(duration: String): Unit = ()
  override def setTimeoutTimestamp(timestampMs: Long): Unit = ()
  override def setTimeoutTimestamp(timestampMs: Long, additionalDuration: String): Unit = ()
  override def setTimeoutTimestamp(timestamp: java.sql.Date): Unit = ()
  override def setTimeoutTimestamp(timestamp: java.sql.Date, additionalDuration: String): Unit = ()
  override def getCurrentWatermarkMs(): Long = 0L
  override def getCurrentProcessingTimeMs(): Long = nowMs
}

class StreamingSpec extends SparkSpec {

  test("near-dup stream: banded simhash pairs match the batch operator across restarts") {
    val base = Files.createTempDirectory("graft-neardup-stream").toString
    val landing = s"$base/landing"
    Files.createDirectories(Paths.get(landing))
    val first = Seq(
      0L -> "the quick brown fox jumps over the lazy dog",
      1L -> "the quick brown fox jumps over the lazy cat",
      2L -> "completely different content about spark engines and shuffles",
      3L -> "the quick brown fox jumps over the lazy dog")
    val second = Seq(
      0L -> "the quick brown fox jumps over the lazy dog", // re-landed
      4L -> "the quick brown fox jumps over the lazy dogs",
      5L -> "spark engines about different completely shuffles and content")
    Files.writeString(Paths.get(s"$landing/a.txt"),
      first.map { case (i, t) => s"$i\t$t" }.mkString("", "\n", "\n"))
    NearDupStream.start(spark, landing, s"$base/out", s"$base/ckpt", maxDist = 12)
      .awaitTermination(60000)
    // second chunk (including a re-landed duplicate of doc 0), restarted
    // from the checkpoint — bucket state must carry over
    Files.writeString(Paths.get(s"$landing/b.txt"),
      second.map { case (i, t) => s"$i\t$t" }.mkString("", "\n", "\n"))
    NearDupStream.start(spark, landing, s"$base/out", s"$base/ckpt", maxDist = 12)
      .awaitTermination(60000)

    import spark.implicits._
    val streamed = spark.read.parquet(s"$base/out")
      .select("id_l", "id_r", "dist").as[(Long, Long, Int)].collect().toSet
    val batch = graft.ops.Dedup.simhashNearDupPairs(
        (first ++ second.tail).toDF("doc_id", "text"), "doc_id", "text",
        maxDist = 12, approximate = true)
      .as[(Long, Long, Int)].collect().toSet
    assert(streamed == batch,
      s"stream $streamed != batch $batch")
    assert(streamed.contains((0L, 3L, 0)), "exact-dup pair missing")

    // the sink's accumulated output is hash-bucketed (BucketedTable
    // layout) and the per-batch anti-join re-read prunes to the touched
    // buckets: a filtered read lists only its bucket's files
    import org.apache.spark.sql.functions.{col, input_file_name}
    val dirs = new java.io.File(s"$base/out").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("bucket="))
    assert(dirs.nonEmpty, "output is not bucket-partitioned")
    val one = dirs.head.stripPrefix("bucket=").toLong
    val pruned = spark.read.parquet(s"$base/out").filter(col("bucket") === one)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"), plan.take(600))
    val prunedFiles = pruned.select(input_file_name()).distinct().collect().map(_.getString(0))
    assert(prunedFiles.nonEmpty && prunedFiles.forall(_.contains(s"bucket=$one")))
    if (dirs.length > 1) {
      val allFiles = spark.read.parquet(s"$base/out")
        .select(input_file_name()).distinct().count()
      assert(prunedFiles.length < allFiles)
    }
  }

  test("decontamination stream: per-batch flags equal the batch Bloom probe, restart processes only new data") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, split}
    val base = Files.createTempDirectory("graft-decontam-stream").toString
    val landing = s"$base/landing"
    Files.createDirectories(Paths.get(landing))
    val evalDocs = Seq(
      (100L, "held out benchmark question about spark shuffle internals"),
      (101L, "another eval prompt on tokenizer merge rules and vocab"))
      .toDF("doc_id", "text")
    val (pos, m) = DecontamStream.evalPositions(evalDocs, "text")
    assert(pos.nonEmpty && m >= 16L)

    val first = Seq(
      1L -> "training doc mentioning benchmark question about spark shuffle internals verbatim",
      2L -> "totally clean training document with original content only")
    val second = Seq(
      3L -> "another eval prompt on tokenizer merge rules and vocab leaked here")
    def land(name: String, docs: Seq[(Long, String)]): Unit =
      Files.writeString(Paths.get(s"$landing/$name"),
        docs.map { case (i, t) => s"$i\t$t" }.mkString("", "\n", "\n"))
    def stream() = {
      val docs = spark.readStream.text(landing)
        .select(split(col("value"), "\t").getItem(0).cast("long").as("doc_id"),
          split(col("value"), "\t").getItem(1).as("text"))
      DecontamStream.run(docs, pos, m, s"$base/out", s"$base/ckpt")
        .awaitTermination(60000)
    }
    land("a.txt", first)
    stream()
    land("b.txt", second)
    stream()

    val streamed = spark.read.parquet(s"$base/out")
      .select("doc_id", "n_grams", "n_flagged", "contaminated")
      .as[(Long, Long, Long, Boolean)].collect().toSet
    val batch = DecontamStream.flagged((first ++ second).toDF("doc_id", "text"), pos, m)
      .as[(Long, Long, Long, Boolean)].collect().toSet
    assert(streamed == batch, s"stream $streamed != batch $batch")
    val contaminated = streamed.filter(_._4).map(_._1)
    assert(contaminated == Set(1L, 3L),
      s"expected docs 1 and 3 flagged, got $contaminated")
    // restart processed ONLY the new file: batch dirs 0 and 1, each once
    val batches = new java.io.File(s"$base/out").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(batches.sameElements(Array("batch=0", "batch=1")), batches.mkString(","))
  }

  test("pack stream: greedy per-source packing, state carries across restarts") {
    val base = Files.createTempDirectory("graft-pack-stream").toString
    val landing = s"$base/landing"
    Files.createDirectories(Paths.get(landing))
    def doc(src: String, id: Long, words: Int): (String, Long, String) =
      (src, id, Seq.fill(words)(s"w$id").mkString(" "))
    val first = Seq(doc("a", 0, 4), doc("a", 1, 5), doc("b", 10, 9), doc("a", 2, 3))
    val second = Seq(doc("a", 3, 6), doc("b", 11, 2), doc("a", 4, 12))
    Files.writeString(Paths.get(s"$landing/a.txt"),
      first.map { case (s, i, t) => s"$s\t$i\t$t" }.mkString("", "\n", "\n"))
    PackStream.start(spark, landing, s"$base/out", s"$base/ckpt", budget = 10)
      .awaitTermination(60000)
    Files.writeString(Paths.get(s"$landing/b.txt"),
      second.map { case (s, i, t) => s"$s\t$i\t$t" }.mkString("", "\n", "\n"))
    PackStream.start(spark, landing, s"$base/out", s"$base/ckpt", budget = 10)
      .awaitTermination(60000)

    import spark.implicits._
    val got = spark.read.parquet(s"$base/out")
      .select("source", "doc_id", "n_tokens", "pack_id")
      .as[(String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    // executable spec: the same greedy fold over each chunk in doc_id
    // order, state carried across the chunk boundary
    // source a: chunk1 sees 0(4),1(5),2(3) -> packs 0:[0,1] (9), 1:[2];
    //           chunk2 sees 3(6),4(12) -> pack 1:[2(3),3(6)] (9), 2:[4]
    assert(got(("a", 0L)) == ((4L, 0L)) && got(("a", 1L)) == ((5L, 0L)))
    assert(got(("a", 2L)) == ((3L, 1L)))
    assert(got(("a", 3L)) == ((6L, 1L)))
    assert(got(("a", 4L)) == ((12L, 2L))) // over budget -> its own pack
    // source b: 10(9) fills pack 0; 11(2) opens pack 1 across the restart
    assert(got(("b", 10L)) == ((9L, 0L)))
    assert(got(("b", 11L)) == ((2L, 1L)))
  }

  test("pack invariants (seeded): budget respected, pack ids contiguous, tokens conserved") {
    import graft.streaming.PackStream.{DocTokens, packDocs, PackState}
    val rnd = new scala.util.Random(23)
    (1 to 8).foreach { trial =>
      val budget = 1 + rnd.nextInt(30)
      val docs = (0 until 40).map(i => DocTokens("s", i.toLong, 1L + rnd.nextInt(20)))
      // drive the packer directly through a fake in-order state sequence
      var st: Option[PackState] = None
      val out = docs.grouped(7).flatMap { chunk =>
        val state = new FakeGroupState(st)
        val res = packDocs(budget)("s", chunk.iterator, state).toSeq
        st = state.updated
        res
      }.toSeq
      // tokens conserved, ids covered
      assert(out.map(_.doc_id).sorted == docs.map(_.doc_id))
      // pack ids start at 0 and are contiguous
      val packs = out.groupBy(_.pack_id)
      assert(packs.keySet == (0L until packs.size.toLong).toSet, s"trial $trial")
      // budget respected unless a pack is a single over-budget doc
      packs.values.foreach { members =>
        val tot = members.map(_.n_tokens).sum
        assert(tot <= budget || members.size == 1, s"trial $trial pack over budget: $members")
      }
      // greedy: a doc only opens a new pack when it did not fit
      val byPack = out.sortBy(d => (d.pack_id, d.doc_id))
      byPack.sliding(2).foreach {
        case Seq(a, b) if b.pack_id == a.pack_id + 1 =>
          val usedInA = byPack.filter(_.pack_id == a.pack_id).map(_.n_tokens).sum
          assert(usedInA + b.n_tokens > budget, s"trial $trial premature new pack")
        case _ => ()
      }
    }
  }

  test("stream-stream interval join: purchases attribute trailing clicks per user") {
    val base = Files.createTempDirectory("graft-join-stream").toString
    val (clicks, purchases) = (s"$base/clicks", s"$base/purchases")
    Files.createDirectories(Paths.get(clicks))
    Files.createDirectories(Paths.get(purchases))
    val t0 = 1700000000L
    Files.writeString(Paths.get(s"$clicks/a.txt"),
      s"$t0,alice\n${t0 + 60},alice\n${t0 + 60},bob\n${t0 - 700},alice\n")
    Files.writeString(Paths.get(s"$purchases/a.txt"),
      s"${t0 + 120},alice,9.5\n")
    val q = JoinStream.start(spark, clicks, purchases,
      s"$base/out", s"$base/ckpt")
    q.awaitTermination(60000)
    val rows = spark.read.parquet(s"$base/out")
      .orderBy("click_at")
      .collect().map(r => (r.getString(0), r.getDouble(3))).toSeq
    // both alice clicks inside [purchase-10min, purchase] match; bob's
    // click has no purchase; alice's 700s-old click is outside the window
    assert(rows == Seq(("alice", 9.5), ("alice", 9.5)), rows.toString)
  }

  test("window stream: watermark finalizes closed minutes exactly once, late data dropped") {
    val base = Files.createTempDirectory("graft-window-stream").toString
    val landing = s"$base/landing"
    Files.createDirectories(Paths.get(landing))
    val t0 = 1700000040L // aligned to a minute boundary
    // minute 0: two clicks, one view
    Files.writeString(Paths.get(s"$landing/a.txt"),
      s"$t0,click\n${t0 + 10},click\n${t0 + 20},view\n")
    val q = WindowStream.start(spark, landing, s"$base/out", s"$base/ckpt")
    q.awaitTermination(60000)
    // nothing finalized yet: watermark = max(ts) - 2 min hasn't passed
    // the window end
    val out0 = spark.read.schema("minute STRING, event_type STRING, n LONG")
      .parquet(s"$base/out")
    assert(out0.count() == 0)

    // advance event time 5 minutes: the watermark passes minute-0's end,
    // so its windows finalize and emit
    Files.writeString(Paths.get(s"$landing/b.txt"), s"${t0 + 300},click\n")
    val q2 = WindowStream.start(spark, landing, s"$base/out", s"$base/ckpt")
    q2.awaitTermination(60000)
    val rows = spark.read.parquet(s"$base/out")
      .orderBy("minute", "event_type")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(rows.map(t => (t._2, t._3)) == Seq(("click", 2L), ("view", 1L)),
      rows.toString)

    // a minute-0 event arriving AFTER the watermark closed that window is
    // dropped — the already-emitted result is final, never retracted
    Files.writeString(Paths.get(s"$landing/c.txt"), s"${t0 + 5},late_click\n")
    val q3 = WindowStream.start(spark, landing, s"$base/out", s"$base/ckpt")
    q3.awaitTermination(60000)
    val rows3 = spark.read.parquet(s"$base/out")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(rows3.toSet == rows.toSet, rows3.toString)
  }

  test("dedup stream: first-seen-wins per fingerprint, state survives restart") {
    val base = Files.createTempDirectory("graft-dedup-stream").toString
    val landing = s"$base/landing"
    Files.createDirectories(Paths.get(landing))
    Files.writeString(Paths.get(s"$landing/a.txt"),
      "alpha doc\nbeta doc\nalpha doc\n") // in-batch dup
    val q = DedupStream.start(spark, landing, s"$base/out", s"$base/ckpt")
    q.awaitTermination(60000)
    val out1 = spark.read.parquet(s"$base/out")
    assert(out1.count() == 2)
    val swallowed = out1.collect()
      .map(r => r.getAs[String]("text") -> r.getAs[Long]("n_dups_swallowed")).toMap
    assert(swallowed("alpha doc") == 1L && swallowed("beta doc") == 0L)

    // re-land an old dup plus one new doc; restart from the checkpoint —
    // only the new doc comes out (keyed state persisted across restarts)
    Files.writeString(Paths.get(s"$landing/b.txt"), "alpha doc\ngamma doc\n")
    val q2 = DedupStream.start(spark, landing, s"$base/out", s"$base/ckpt")
    q2.awaitTermination(60000)
    val texts = spark.read.parquet(s"$base/out")
      .select("text").collect().map(_.getString(0)).toSeq
    assert(texts.length == 3 && texts.count(_ == "alpha doc") == 1
      && texts.contains("gamma doc"))
  }

  test("dedup stream TTL: state evicted past the horizon, dedup holds within it") {
    import graft.streaming.DedupStream.{Doc, SeenState, firstSeen}
    val ttl = Some(2000L)

    // timeout callback (bucket idle past TTL): state is removed
    val idle = new FakeGroupState[SeenState](Some(SeenState(3L, 0L)), timedOut = true)
    assert(firstSeen(ttl)(42L, Iterator.empty, idle).isEmpty && idle.updated.isEmpty)

    // within the horizon: a re-arrival is swallowed, counter bumps,
    // timeout re-armed to the TTL
    val live = new FakeGroupState[SeenState](Some(SeenState(1L, 1000L)), nowMs = 2500L)
    assert(firstSeen(ttl)(42L, Iterator.single(Doc(42L, "x")), live).isEmpty)
    assert(live.updated.contains(SeenState(2L, 2500L)) && live.lastTimeoutMs.contains(2000L))

    // past the horizon but data arrived before the timeout fired: the
    // lazy check treats the key as first-seen again (exact horizon)
    val stale = new FakeGroupState[SeenState](Some(SeenState(5L, 1000L)), nowMs = 4000L)
    val out = firstSeen(ttl)(42L, Iterator.single(Doc(42L, "x")), stale).toSeq
    assert(out.map(_.n_dups_swallowed) == Seq(0L), out.toString)
    assert(stale.updated.contains(SeenState(1L, 4000L)))

    // no TTL: original unbounded behavior, no timeout armed
    val noTtl = new FakeGroupState[SeenState](Some(SeenState(1L, 0L)))
    assert(firstSeen(None)(42L, Iterator.single(Doc(42L, "x")), noTtl).isEmpty)
    assert(noTtl.lastTimeoutMs.isEmpty)

    // end-to-end through real streaming queries. Wall-clock between two
    // AvailableNow runs is seconds and uncontrollable, so the horizons
    // are chosen to make the outcome timing-independent: a 10-minute TTL
    // cannot elapse between batches (dup swallowed), a 1 ms TTL cannot
    // survive the gap (state expired, doc re-emitted). The exact-clock
    // arithmetic is pinned by the FakeGroupState cases above.
    val base = Files.createTempDirectory("graft-dedup-ttl").toString
    val (longL, shortL) = (s"$base/long/landing", s"$base/short/landing")
    Files.createDirectories(Paths.get(longL))
    Files.createDirectories(Paths.get(shortL))
    val longTtl = Some(600000L)
    Files.writeString(Paths.get(s"$longL/a.txt"), "alpha doc\nbeta doc\n")
    DedupStream.start(spark, longL, s"$base/long/out", s"$base/long/ckpt", longTtl)
      .awaitTermination(60000)
    Files.writeString(Paths.get(s"$longL/b.txt"), "alpha doc\n") // within TTL
    DedupStream.start(spark, longL, s"$base/long/out", s"$base/long/ckpt", longTtl)
      .awaitTermination(60000)
    assert(spark.read.parquet(s"$base/long/out").count() == 2) // dup swallowed

    val shortTtl = Some(1L)
    Files.writeString(Paths.get(s"$shortL/a.txt"), "alpha doc\n")
    DedupStream.start(spark, shortL, s"$base/short/out", s"$base/short/ckpt", shortTtl)
      .awaitTermination(60000)
    Files.writeString(Paths.get(s"$shortL/b.txt"), "alpha doc\n") // past TTL
    DedupStream.start(spark, shortL, s"$base/short/out", s"$base/short/ckpt", shortTtl)
      .awaitTermination(60000)
    val alphas = spark.read.parquet(s"$base/short/out").collect()
    assert(alphas.length == 2, s"expired key not re-emitted: ${alphas.toSeq}")
    assert(alphas.forall(_.getAs[Long]("n_dups_swallowed") == 0L))
  }

  test("near-dup stream TTL: stale bucket members pruned, idle buckets evicted") {
    import graft.streaming.NearDupStream.{BandedDoc, BucketState, matchBucket}
    val ttl = Some(2000L)

    // idle bucket past TTL: wholesale eviction
    val idle = new FakeGroupState[BucketState](
      Some(BucketState(List((1L, 7L, 0L)))), timedOut = true)
    assert(matchBucket(3, ttl)((0, 1L), Iterator.empty, idle).isEmpty
      && idle.updated.isEmpty)

    // a member seen at t=0 no longer matches at t=5000 even though its
    // simhash is identical — but a live member still does
    val st = new FakeGroupState[BucketState](
      Some(BucketState(List((1L, 7L, 0L), (2L, 7L, 4000L)))), nowMs = 5000L)
    val pairs = matchBucket(3, ttl)((0, 1L),
      Iterator.single(BandedDoc(0, 1L, 9L, 7L)), st).toSeq
    assert(pairs == Seq(graft.streaming.NearDupStream.NearDupPair(2L, 9L, 0)),
      pairs.toString)
    // pruned state: stale member gone, live + new remain, timeout re-armed
    val members = st.updated.get.members.map(m => (m._1, m._2)).toSet
    assert(members == Set((2L, 7L), (9L, 7L)) && st.lastTimeoutMs.contains(2000L))

    // no TTL: nothing pruned, nothing armed (original behavior)
    val keep = new FakeGroupState[BucketState](Some(BucketState(List((1L, 7L, 0L)))))
    val p2 = matchBucket(3, None)((0, 1L),
      Iterator.single(BandedDoc(0, 1L, 9L, 7L)), keep).toSeq
    assert(p2.nonEmpty && keep.updated.get.members.size == 2
      && keep.lastTimeoutMs.isEmpty)
  }

  test("ingest stream: landing JSON → people + audit appended per micro-batch") {
    val base = Files.createTempDirectory("graft-stream").toString
    val landing = s"$base/landing"
    Files.createDirectories(Paths.get(landing))
    val body =
      """[{"first_name":"Ada","full_name":"Ada L","_batch_metadata":{"batch_id":"b-1","batch_timestamp":"t","employee_range":"1-10","webhook_name":"w","source":"hq-data-warehouse"}},{"first_name":"Bob","full_name":"Bob M"}]"""
    Files.writeString(Paths.get(s"$landing/req1.json"), body + "\n")

    val q = IngestStream.start(spark, landing,
      s"$base/people", s"$base/audit", s"$base/ckpt")
    q.awaitTermination(60000)

    val people = spark.read.parquet(s"$base/people")
    assert(people.count() == 2)
    assert(people.columns.toSeq == graft.model.Dims.Schemas.clayFindPeopleColumns)
    val audit = spark.read.parquet(s"$base/audit").collect().head
    assert(audit.getAs[String]("batch_id") == "b-1")
    assert(audit.getAs[Int]("records_received") == 2)
    assert(audit.getAs[String]("status") == "success")

    // second request lands → incremental micro-batch appends
    Files.writeString(Paths.get(s"$landing/req2.json"),
      """{"first_name":"Solo"}""" + "\n")
    val q2 = IngestStream.start(spark, landing,
      s"$base/people", s"$base/audit", s"$base/ckpt")
    q2.awaitTermination(60000)
    assert(spark.read.parquet(s"$base/people").count() == 3)
    assert(spark.read.parquet(s"$base/audit").count() == 2)
  }

  test("pack stream at sf0.1 scale: two-restart stream equals the batch greedy fold [slow]") {
    import org.apache.spark.sql.functions.{col, regexp_replace}
    import graft.streaming.PackStream.{DocTokens, PackState, packDocs}
    val base = Files.createTempDirectory("graft-pack-sf01").toString
    val landing = s"$base/landing"
    Files.createDirectories(Paths.get(landing))

    // The landing format is one TSV line per doc, so tabs/newlines inside
    // document text are flattened to spaces on BOTH sides of the
    // comparison (token counts must come from identical strings).
    val docs = graft.model.Tables.documents(spark, "/root/testdata/sf0.1")
      .select(col("source"), col("doc_id"),
        regexp_replace(col("text"), "[\\t\\n\\r]+", " ").as("text"))
    import spark.implicits._
    val rows = docs.as[(String, Long, String)].collect().sortBy(_._2)
    assert(rows.length >= 1000, s"sf0.1 documents unexpectedly small: ${rows.length}")

    // land in two doc_id-ordered chunks with a stream restart between
    // them: per-source arrival order equals global doc_id order, so the
    // carried PackState must reproduce the single-pass batch fold exactly
    val mid = rows(rows.length / 2)._2
    def land(file: String, chunk: Array[(String, Long, String)]): Unit =
      Files.writeString(Paths.get(s"$landing/$file"),
        chunk.map { case (s, i, t) => s"$s\t$i\t$t" }.mkString("", "\n", "\n"))
    val budget = 2048L
    land("chunk1.tsv", rows.filter(_._2 < mid))
    PackStream.start(spark, landing, s"$base/out", s"$base/ckpt", budget)
      .awaitTermination(120000)
    land("chunk2.tsv", rows.filter(_._2 >= mid))
    PackStream.start(spark, landing, s"$base/out", s"$base/ckpt", budget)
      .awaitTermination(120000)

    val streamed = spark.read.parquet(s"$base/out")
      .select("source", "doc_id", "n_tokens", "pack_id")
      .as[(String, Long, Long, Long)].collect().toSet

    // batch reference: the same token kernel, then the greedy fold per
    // source over ALL docs in one in-order pass (packDocs doubles as the
    // executable spec — driven here with a fresh empty state per source)
    val withTokens = docs
      .select(col("source"), col("doc_id"),
        graft.ops.TextAnalysis.tokenCount(col("text")).as("n_tokens"))
      .as[DocTokens].collect()
    val batch = withTokens.groupBy(_.source).iterator.flatMap { case (src, ds) =>
      packDocs(budget)(src, ds.sortBy(_.doc_id).iterator,
        new FakeGroupState[PackState](None))
    }.map(p => (p.source, p.doc_id, p.n_tokens, p.pack_id)).toSet

    assert(streamed.size == rows.length, s"row drop: ${streamed.size} vs ${rows.length}")
    assert(streamed == batch,
      s"stream != batch; examples only in stream: ${(streamed -- batch).take(3)}, " +
        s"only in batch: ${(batch -- streamed).take(3)}")

    // scale sanity: budget respected for every multi-doc pack
    val over = streamed.groupBy(t => (t._1, t._4)).filter { case (_, ms) =>
      ms.map(_._3).sum > budget && ms.size > 1
    }
    assert(over.isEmpty, s"packs over budget: ${over.keys.take(3)}")
  }

  test("indexed dedup stream: durable-index probe+append across restarts; batch replay is idempotent") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val base = Files.createTempDirectory("graft-idxstream").toString
    val (landing, idx, out) = (s"$base/landing", s"$base/index", s"$base/out")
    Files.createDirectories(Paths.get(landing))
    // bootstrap corpus: doc 1 will be duplicated by a streamed doc
    graft.ops.IncrementalDedup.buildIndex(
      Seq((1L, "the quick brown fox jumps over the lazy dog near the river"),
          (2L, "entirely unrelated corpus document about catalyst plans"))
        .toDF("doc_id", "text"),
      idx, "doc_id", "text", shingleN = 2, numHashes = 64, bands = 16, nBuckets = 8)

    Files.writeString(Paths.get(s"$landing/a.txt"),
      "10\tthe quick brown fox jumps over the lazy dog near the river\n" +
        "11\ta fresh streamed document matching nothing else at all\n")
    IndexedDedupStream.start(spark, landing, idx, out, s"$base/ckpt")
      .awaitTermination(60000)
    // restart from checkpoint; second batch duplicates a FIRST-BATCH doc —
    // catching it requires batch 1's entries to be durably in the index
    Files.writeString(Paths.get(s"$landing/b.txt"),
      "20\ta fresh streamed document matching nothing else at all\n")
    IndexedDedupStream.start(spark, landing, idx, out, s"$base/ckpt")
      .awaitTermination(60000)

    val pairs = spark.read.parquet(out).select("id_l", "id_r")
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 10L)), s"corpus-vs-stream dup missed: $pairs")
    assert(pairs.contains((11L, 20L)), s"stream-vs-earlier-stream dup missed: $pairs")
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L), s"false pair: $pairs")

    // replay: re-running an already-committed batch must not grow the
    // index or change the published pairs
    val versionsBefore = graft.sinks.ManifestTable.versions(spark, idx)
    val replayed = Seq((20L, "a fresh streamed document matching nothing else at all"))
      .toDF("doc_id", "text")
    val lastBatchId = new java.io.File(out).listFiles
      .map(_.getName).filter(_.startsWith("batch=")).map(_.stripPrefix("batch=").toLong).max
    IndexedDedupStream.processBatch(idx, out, 2, 64, 16, 0.5)(replayed, lastBatchId)
    assert(graft.sinks.ManifestTable.versions(spark, idx) == versionsBefore,
      "replayed batch appended to the index again")
    val pairsAfter = spark.read.parquet(out).select("id_l", "id_r")
      .as[(Long, Long)].collect().toSet
    assert(pairsAfter == pairs, s"replay changed pairs: ${pairsAfter -- pairs}")
  }

  test("indexed dedup stream: replay after compact erased directory evidence still appends exactly once") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-idxtxn").toString
    val (idx, out) = (s"$base/index", s"$base/out")
    graft.ops.IncrementalDedup.buildIndex(
      Seq((1L, "bootstrap corpus document with enough words to shingle"))
        .toDF("doc_id", "text"),
      idx, "doc_id", "text", shingleN = 2, numHashes = 64, bands = 16, nBuckets = 8)
    val batch = Seq((10L, "a streamed document that lands in several band buckets"))
      .toDF("doc_id", "text")
    IndexedDedupStream.processBatch(idx, out, 2, 64, 16, 0.5)(batch, 3L)
    val rowsAfterCommit = graft.sinks.ManifestTable.read(spark, idx).count()
    // the adversarial window the r6 marker design lost: maintenance
    // folds the batch's txn-<app>-3 dirs into fresh UUID dirs, so NO
    // filesystem evidence of the append remains — only the manifest's
    // txn watermark. A dir-presence gate would re-append here.
    graft.sinks.ManifestTable.compact(spark, idx, maxDirs = 1)
    IndexedDedupStream.processBatch(idx, out, 2, 64, 16, 0.5)(batch, 3L)
    assert(graft.sinks.ManifestTable.read(spark, idx).count() == rowsAfterCommit,
      "replay after compact duplicated index entries")
  }

  test("indexed dedup stream: crash mid-staging leaves an orphan the replay overwrites (row counts equal the exactly-once run)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val base = Files.createTempDirectory("graft-idxstage").toString
    val idx = s"$base/index"
    graft.ops.IncrementalDedup.buildIndex(
      Seq((1L, "bootstrap corpus document with enough words to shingle"))
        .toDF("doc_id", "text"),
      idx, "doc_id", "text", shingleN = 2, numHashes = 64, bands = 16, nBuckets = 8)
    val baseline = graft.sinks.ManifestTable.read(spark, idx).count()
    val entries = graft.ops.IncrementalDedup.indexEntries(
      Seq((10L, "a streamed document that lands in several band buckets"))
        .toDF("doc_id", "text"), "doc_id", "text", 2, 64, 16)
      .localCheckpoint()
    // simulate: previous attempt staged data/txn-s-7 then died BEFORE
    // publishing — the dir exists on disk but no manifest references it
    graft.sinks.ManifestTable.stageSlice(spark, idx,
      entries.withColumn("bucket",
        pmod(xxhash64(col("bandkey")), lit(8L)).cast("int")),
      Some("txn-s-7"))
    val vBefore = graft.sinks.ManifestTable.versions(spark, idx)
    assert(graft.sinks.ManifestTable.appendOnce(spark, idx, entries,
      "bandkey", "s", 7L), "first (replayed) appendOnce must commit")
    assert(!graft.sinks.ManifestTable.appendOnce(spark, idx, entries,
      "bandkey", "s", 7L), "second appendOnce must skip")
    assert(graft.sinks.ManifestTable.versions(spark, idx).size == vBefore.size + 1)
    assert(graft.sinks.ManifestTable.read(spark, idx).count() ==
      baseline + entries.count(), "orphaned staging dir duplicated rows")
    // a LATER batch for the same stream still lands
    assert(graft.sinks.ManifestTable.appendOnce(spark, idx,
      entries.withColumn("id", col("id") + 100), "bandkey", "s", 8L))
  }
}
