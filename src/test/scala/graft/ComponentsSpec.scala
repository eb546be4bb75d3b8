package graft

import graft.ops.Dedup

class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("connected components: chains merge transitively, singletons stay") {
    val nodes = (1L to 10L).toDF("id")
    // chain 1-2-3-4, pair 6-7, singletons 5, 8, 9, 10
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (6L, 7L)).toDF("id_l", "id_r")
    val got = Dedup.connectedComponents(nodes, "id", pairs)
      .as[(Long, Long)].collect().toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(got(_) == 1L))
    assert(got(6L) == 6L && got(7L) == 6L)
    assert(Seq(5L, 8L, 9L, 10L).forall(i => got(i) == i))
  }

  test("connected components: cycle and long chain converge") {
    val nodes = (1L to 8L).toDF("id")
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 1L), // cycle
      (4L, 5L), (5L, 6L), (6L, 7L), (7L, 8L) // chain of 5
    ).toDF("id_l", "id_r")
    val got = Dedup.connectedComponents(nodes, "id", pairs)
      .as[(Long, Long)].collect().toMap
    assert(Seq(1L, 2L, 3L).forall(got(_) == 1L))
    assert(Seq(4L, 5L, 6L, 7L, 8L).forall(got(_) == 4L))
  }

  test("long chain converges across several checkpoint-interval cycles") {
    // a 12-node path needs ~11 min-label iterations — the loop passes
    // through the durable-checkpoint branch (every 3rd iter) four times
    // with cached iterations in between, all on one lineage
    // (driverEdgeLimit = 0 forces the distributed loop under test)
    val nodes = (1L to 12L).toDF("id")
    val pairs = (1L until 12L).map(i => (i, i + 1)).toDF("id_l", "id_r")
    val got = Dedup.connectedComponents(nodes, "id", pairs, maxIter = 20,
        driverEdgeLimit = 0L)
      .as[(Long, Long)].collect().toMap
    assert((1L to 12L).forall(got(_) == 1L), s"labels $got")
  }

  test("pointer doubling: a 300-node chain converges within the DEFAULT iteration bound") {
    // diameter 299 ≫ maxIter=10 — the plain 1-hop loop would silently
    // SPLIT this component (the r4 dedup_keep_best bug: a 235-member
    // hamming-chain cluster in the sf0.01 fixture); label-of-label
    // compression converges in O(log diameter)
    // (driverEdgeLimit = 0 forces the distributed loop under test)
    val n = 300L
    val nodes = (1L to n).toDF("id")
    val pairs = (1L until n).map(i => (i, i + 1)).toDF("id_l", "id_r")
    val got = Dedup.connectedComponents(nodes, "id", pairs,
        driverEdgeLimit = 0L)
      .as[(Long, Long)].collect().toMap
    assert((1L to n).forall(got(_) == 1L),
      s"chain split into ${got.values.toSet.size} labels")
  }

  test("driver union-find path ≡ distributed loop on random graphs") {
    val rng = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      val n = 30 + rng.nextInt(40)
      val nodes = (1L to n.toLong).toDF("id")
      val m = rng.nextInt(60)
      val raw = Seq.fill(m)((rng.nextInt(n) + 1L, rng.nextInt(n) + 1L))
      // self-loops and duplicate/reversed edges included on purpose
      val pairs = raw.toDF("id_l", "id_r")
      val fast = Dedup.connectedComponents(nodes, "id", pairs)
        .as[(Long, Long)].collect().toMap
      val loop = Dedup.connectedComponents(nodes, "id", pairs, maxIter = 20,
          driverEdgeLimit = 0L)
        .as[(Long, Long)].collect().toMap
      assert(fast == loop, s"trial $trial: driver $fast vs loop $loop")
    }
  }

  test("non-long ids fall back to the distributed loop (same result)") {
    val nodes = Seq(1, 2, 3, 4, 5).toDF("id") // IntegerType
    val pairs = Seq((1, 2), (2, 3)).toDF("id_l", "id_r")
    val got = Dedup.connectedComponents(nodes, "id", pairs)
      .as[(Int, Int)].collect().toMap
    assert(got == Map(1 -> 1, 2 -> 1, 3 -> 1, 4 -> 4, 5 -> 5))
  }

  test("reliable-checkpoint branch actually runs: dir set, checkpoint files written") {
    // the session (like Verify/Bench) sets a checkpoint dir, so the loop
    // must take df.checkpoint (reliable), not localCheckpoint
    val ckptDir = spark.sparkContext.getCheckpointDir
    assert(ckptDir.isDefined, "harness session must define a checkpoint dir")
    def ckptFiles(): Long = {
      val d = new java.io.File(new java.net.URI(ckptDir.get))
      if (d.exists()) java.nio.file.Files.walk(d.toPath).count() else 0L
    }
    val before = ckptFiles()
    val nodes = (1L to 6L).toDF("id")
    val pairs = Seq((1L, 2L), (3L, 4L)).toDF("id_l", "id_r")
    val got = Dedup.connectedComponents(nodes, "id", pairs,
        driverEdgeLimit = 0L)
      .as[(Long, Long)].collect().toMap
    assert(got(2L) == 1L && got(4L) == 3L && got(5L) == 5L)
    assert(ckptFiles() > before,
      "no files appeared under the checkpoint dir — the loop took the local branch")
  }

  test("soft_dedup_weights: cluster mass sums to 1, singletons keep full weight") {
    val rows = graft.queries.ExtendedQueries.softDedupWeights(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, n, w) =>
      assert(w > 0.0 && w <= 1.0 && math.abs(w - 1.0 / n) < 1e-6) }
    rows.groupBy(_._2).foreach { case (c, members) =>
      assert(math.abs(members.map(_._4).sum - 1.0) < 1e-3,
        s"cluster $c mass ${members.map(_._4).sum}")
      if (members.length == 1) assert(members.head._4 == 1.0)
    }
    // weights preserve the corpus' "one vote per unique content" total
    assert(math.abs(rows.map(_._4).sum - rows.map(_._2).distinct.length) < 0.01)
  }
}
