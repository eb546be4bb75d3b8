package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.Sketches
import graft.ops.{Dedup, Multimodal}

/** Perceptual media near-dup: the dHash kernel, the banded-Hamming
  * candidate join (banded ≡ brute on planted near-dups — the exactness
  * claim behind `media_near_dup`'s oracle), and the cluster composition.
  */
class MediaDedupSpec extends SparkSpec {

  /** Deterministic pseudo-random payload (LCG) — stands in for decoded
    * media bytes; seeds far apart give uncorrelated signals.
    */
  private def payload(seed: Long, len: Int): Array[Byte] = {
    val out = new Array[Byte](len)
    var s = seed
    var i = 0
    while (i < len) {
      s = s * 6364136223846793005L + 1442695040888963407L
      out(i) = (s >>> 56).toByte
      i += 1
    }
    out
  }

  /** A "lightly corrupted copy": flip a few localized byte runs — the
    * media analog of a re-encode artifact or small overlay.
    */
  private def corrupt(base: Array[Byte], at: Int, runLen: Int): Array[Byte] = {
    val out = base.clone()
    var i = at
    while (i < math.min(at + runLen, out.length)) { out(i) = (out(i) ^ 0x7F).toByte; i += 1 }
    out
  }

  test("dhash63 kernel: block means and gradient bits, edge cases") {
    // empty payload → all pixels 0 → no gradient ever strictly positive
    assert(Sketches.dhash63(Array.empty[Byte]) === 0L)
    // constant payload → all block means equal → no strict gradients
    assert(Sketches.dhash63(Array.fill[Byte](500)(7)) === 0L)
    // monotone-increasing signal → every horizontal gradient is negative
    // (later blocks have larger means) → still 0 under the > rule …
    val inc = Array.tabulate[Byte](720)(i => (i / 3).toByte)
    assert(Sketches.dhash63(inc) === 0L)
    // … and the reversed signal sets ALL 63 bits
    assert(Sketches.dhash63(inc.reverse) === (1L << 63) - 1,
      "strictly decreasing signal must set every gradient bit")
    // fingerprint is always non-negative (63 bits in a signed long)
    val fp = Sketches.dhash63(payload(42L, 3000))
    assert(fp >= 0L)
    // sub-72-byte payload: empty blocks read 0, no crash, deterministic
    assert(Sketches.dhash63(payload(1L, 10)) === Sketches.dhash63(payload(1L, 10)))
  }

  test("dhash63 robustness: localized corruption moves few bits") {
    val base = payload(99L, 4096)
    val near = corrupt(base, at = 1000, runLen = 40) // < one 56-byte block
    val far = payload(7L, 4096)
    val dNear = java.lang.Long.bitCount(Sketches.dhash63(base) ^ Sketches.dhash63(near))
    val dFar = java.lang.Long.bitCount(Sketches.dhash63(base) ^ Sketches.dhash63(far))
    assert(dNear <= 4, s"40 corrupted bytes of 4096 flipped $dNear bits")
    assert(dFar >= 20, s"independent payloads landed at distance $dFar")
  }

  test("DHashExpr matches the kernel and rejects non-binary input") {
    val rows = (0 until 20).map(i => Row(i.toLong, payload(i * 31L + 5, 200 + i * 37)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2),
      StructType(Seq(StructField("id", LongType), StructField("media", BinaryType))))
    val got = df.select(col("id"), Sketches.dhash(col("media")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(got(r.getLong(0)) ===
        Sketches.dhash63(r.get(1).asInstanceOf[Array[Byte]]))
    }
    val bad = df.select(col("id").cast("string").as("s"))
    assertThrows[org.apache.spark.sql.AnalysisException] {
      bad.select(Sketches.dhash(col("s"))).collect()
    }
  }

  test("banded pairs ≡ brute force on a planted near-dup set") {
    // 40 independent base payloads; plant near-dup copies of 8 of them
    // (localized corruptions at varying severity, some past maxDist so
    // the threshold edge is exercised in BOTH directions)
    val bases = (0 until 40).map(i => i.toLong -> payload(i * 1000L + 3, 2048))
    val planted = (0 until 8).map { i =>
      (100L + i) -> corrupt(bases(i)._2, at = 200 * i, runLen = 10 + 60 * i)
    }
    val all = bases ++ planted
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(all.map { case (id, b) => Row(id, b) }, 3),
      StructType(Seq(StructField("id", LongType), StructField("media", BinaryType))))
    val fps = df.select(col("id"), Sketches.dhash(col("media")).as("sh"))

    val maxDist = 8
    val banded = Dedup.bandedHammingPairs(fps, nBands = 9, bandBits = 7,
        maxDist = maxDist)
      .select("id_l", "id_r").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val local = all.map { case (id, b) => id -> Sketches.dhash63(b) }
    val brute = (for {
      (i, fi) <- local; (j, fj) <- local
      if i < j && java.lang.Long.bitCount(fi ^ fj) <= maxDist
    } yield (i, j)).toSet

    assert(banded === brute,
      s"banded candidates missed or invented pairs: banded=$banded brute=$brute")
    assert(brute.nonEmpty, "planted set produced no near-dup pairs — test is vacuous")
    assert(brute.exists { case (l, r) => r >= 100L },
      "no planted copy survived as a near-dup pair")
  }

  test("mega-bucket star guard preserves distance-0 connectivity") {
    // many identical payloads collide on ALL bands; with a tiny
    // maxBucketSize they take the hub-star path and must stay connected
    val same = payload(5L, 1024)
    val rows = (0L until 30L).map(i => Row(i, same)) :+ Row(99L, payload(8L, 1024))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2),
      StructType(Seq(StructField("id", LongType), StructField("media", BinaryType))))
    val fps = df.select(col("id"), Sketches.dhash(col("media")).as("sh"))
    val pairs = Dedup.bandedHammingPairs(fps, nBands = 9, bandBits = 7,
      maxDist = 8, maxBucketSize = 4)
    val cc = Dedup.connectedComponents(fps, "id", pairs)
    val clusters = cc.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L until 30L).map(clusters).toSet.size === 1,
      "identical payloads must land in one cluster via the star guard")
    assert(clusters(99L) === 99L, "unrelated payload must stay a singleton")
  }

  test("nearDupClusters composition on the documents fixture") {
    val media = Multimodal.fromDocuments(
      graft.model.Tables.documents(spark, sfDir))
    val out = Multimodal.nearDupClusters(media, "media_id", "media").collect()
    val n = media.count()
    assert(out.length === n, "one row per media item, singletons included")
    // fp column is the exported fingerprint: non-negative, matches kernel
    // for a spot-checked row
    assert(out.forall(_.getLong(1) >= 0L))
    val clusters = out.map(r => r.getLong(0) -> r.getLong(2)).toMap
    // cluster labels are min-member ids: label ≤ id always
    assert(clusters.forall { case (id, c) => c <= id })
  }
}
