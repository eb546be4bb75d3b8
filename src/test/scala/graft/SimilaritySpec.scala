package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions
import graft.ops.{Multimodal, Similarity}

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic pseudo-random corpus: 3 tight clusters + noise. */
  private def clustered(n: Int, dim: Int): Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(7)
    val centers = Array.fill(3, dim)(rnd.nextGaussian().toFloat)
    (0 until n).map { i =>
      val c = centers(i % 3)
      val v = c.map(x => x + 0.05f * rnd.nextGaussian().toFloat)
      (i.toLong, v)
    }
  }

  test("cosine HOF matches a Scala double computation") {
    val a = Array(1.0f, 2.0f, 3.0f)
    val b = Array(-1.0f, 0.5f, 2.0f)
    val exp = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      dot / (math.sqrt(a.map(x => x.toDouble * x).sum) * math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    val got = Seq((a.toSeq, b.toSeq)).toDF("a", "b")
      .select(VectorFunctions.cosine($"a", $"b")).as[Double].collect().head
    assert(math.abs(got - exp) < 1e-12)
  }

  test("brute-force top-k: planted duplicate is its twin's top neighbor") {
    val base = clustered(60, 16)
    val withDup = base :+ (999L, base.head._2.clone()) // exact dup of vec 0
    val df = withDup.toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(df, df.filter($"vec_id" === 999L),
        "vec_id", "embedding", k = 1)
      .select($"neighbor_id").as[Long].collect()
    assert(top.head == 0L)
  }

  test("LSH top-k recall ≥ 0.6 vs brute force on clustered data") {
    val df = clustered(120, 16).toDF("vec_id", "embedding")
    val queries = df.filter($"vec_id" < 15)
    val brute = Similarity.bruteForceTopK(df, queries, "vec_id", "embedding", k = 3)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val lsh = Similarity.lshTopK(df, queries, "vec_id", "embedding",
        k = 3, dim = 16, nPlanes = 6)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = brute.intersect(lsh).size.toDouble / brute.size
    assert(recall >= 0.6, s"recall $recall")
  }

  test("SQ8 top-k: high recall vs brute force, exact dup still wins") {
    val base = clustered(120, 16)
    val withDup = base :+ (999L, base.head._2.clone())
    val df = withDup.toDF("vec_id", "embedding")
    val queries = df.filter($"vec_id" < 15)
    val brute = Similarity.bruteForceTopK(df, queries, "vec_id", "embedding", k = 3)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val sq8 = Similarity.sq8TopK(df, queries, "vec_id", "embedding", k = 3)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    // int8 cosine ≈ float cosine to ~1e-2; tight clusters are dense with
    // near-ties that quantization legitimately reorders, so compare sets
    // with headroom (0.82 observed on this fixture)
    val recall = brute.intersect(sq8).size.toDouble / brute.size
    assert(recall >= 0.75, s"recall $recall")
    // an exact duplicate quantizes identically → cosine 1 at rank 1
    // (up to the sqrt(n)·sqrt(n) ≈ n ulp, since norms are exact ints)
    val dup = Similarity.sq8TopK(df, df.filter($"vec_id" === 999L),
        "vec_id", "embedding", k = 1)
      .select($"neighbor_id", $"sim").as[(Long, Double)].collect().head
    assert(dup._1 == 0L && math.abs(dup._2 - 1.0) < 1e-12)
  }

  test("nearestNeighbor pairs planted twins") {
    val base = clustered(40, 16)
    val withDup = base :+ (999L, base.head._2.clone())
    val nn = Similarity.nearestNeighbor(withDup.toDF("vec_id", "embedding"),
        "vec_id", "embedding")
      .select($"vec_id", $"nn_id", $"sim").as[(Long, Long, Double)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    assert(nn(999L)._1 == 0L && nn(999L)._2 > 0.9999)
    assert(nn(0L)._1 == 999L)
  }

  test("bounded embedding_nn gate ≡ unbounded nearestNeighbor on the query slice") {
    // the gate runs bruteForceTopK k=1 over a bounded broadcast slice;
    // it must produce exactly what the quadratic verification primitive
    // says for those same queries
    val gate = graft.queries.ExtendedQueries.embeddingNn(spark, sfDir)
      .as[(Long, Long, Double)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    val full = Similarity.nearestNeighbor(
        spark.read.parquet(s"$sfDir/embeddings.parquet"), "vec_id", "embedding",
        roundTo = Some(6))
      .filter($"vec_id" < 50)
      .select($"vec_id", $"nn_id", $"sim").as[(Long, Long, Double)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    assert(gate.size == full.size && gate.keySet == full.keySet)
    full.foreach { case (id, (nnId, sim)) =>
      assert(gate(id) == (nnId, sim), s"gate/full mismatch for vec $id")
    }
  }

  test("nearestNeighborLsh finds planted twins through the bucket join") {
    val base = clustered(40, 16)
    val withDup = base :+ (999L, base.head._2.clone()) // identical vector → identical bucket
    val nn = Similarity.nearestNeighborLsh(withDup.toDF("vec_id", "embedding"),
        "vec_id", "embedding", dim = 16, nPlanes = 6)
      .select($"vec_id", $"nn_id", $"sim").as[(Long, Long, Double)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    assert(nn(999L)._1 == 0L && nn(999L)._2 > 0.9999)
    assert(nn(0L)._1 == 999L)
  }

  test("nearDupPairsLsh: planted twins pair up; clusters form over the pair graph") {
    val base = clustered(40, 16)
    // two planted duplicate groups: {0, 900, 901} identical and {1, 902}
    val withDups = base ++ Seq(
      (900L, base(0)._2.clone()), (901L, base(0)._2.clone()),
      (902L, base(1)._2.clone()))
    val df = withDups.toDF("vec_id", "embedding")
    val pairs = Similarity.nearDupPairsLsh(df, "vec_id", "embedding",
        dim = 16, nPlanes = 6, threshold = 0.9999)
      .select($"id_l", $"id_r").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 900L)) && pairs.contains((0L, 901L)))
    assert(pairs.contains((1L, 902L)))
    // every pair is ordered and deduplicated
    assert(pairs.forall { case (l, r) => l < r })
    val clusters = graft.ops.Dedup.connectedComponents(
        df.select($"vec_id"), "vec_id", pairs.toSeq.toDF("id_l", "id_r"))
      .as[(Long, Long)].collect().toMap
    assert(clusters(900L) == 0L && clusters(901L) == 0L)
    assert(clusters(902L) == 1L)
  }

  test("multimodal: batch decode stub is deterministic and batch-shaped") {
    val docs = Seq((1L, "aaaa"), (2L, "bbbbbbbb"), (3L, "")).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("src0"))
      .withColumn("n_chars", length($"text").cast("long"))
    val media = Multimodal.fromDocuments(docs).as[Multimodal.MediaRecord]
    val feats = Multimodal.extractFeatures(media, batchSize = 2)
      .collect().map(f => f.media_id -> f).toMap
    assert(feats(1L).n_bytes == 4 && feats(1L).byte_mean == 'a'.toInt.toDouble)
    assert(feats(2L).n_bytes == 8)
    assert(feats(3L).n_bytes == 0 && feats(3L).byte_mean == 0.0)
    // feature vector: histogram of 'a' bytes lands entirely in bucket 1
    assert(feats(1L).features(1) == 1.0f)
  }

  test("resize stub: deterministic nearest-neighbor byte resample") {
    val docs = Seq((1L, "abcdefgh" * 16)).toDF("doc_id", "text") // 128 bytes
      .withColumn("lang", lit("en")).withColumn("source", lit("src0"))
      .withColumn("n_chars", length($"text").cast("long"))
    val media = Multimodal.fromDocuments(docs).as[Multimodal.MediaRecord]
    val r1 = Multimodal.resizeStub(media, 4, 4).collect().head
    val r2 = Multimodal.resizeStub(media, 4, 4).collect().head
    assert(r1.pixels.toSeq == r2.pixels.toSeq) // deterministic
    assert(r1.pixels.length == 16)
    // nearest-neighbor: pixel i = src[i*128/16] = src[i*8] = 'a' each block
    assert(r1.pixels.forall(_ == 'a'.toByte))
  }

  test("frame sampling: stride-2 64-byte frames with correct count") {
    val docs = Seq((1L, "x" * 300)).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("src0"))
      .withColumn("n_chars", length($"text").cast("long"))
    val frames = Multimodal.sampleFrames(Multimodal.fromDocuments(docs), 64, 2)
    // 300 bytes → 4 whole frames (0..3) → sampled idx 0, 2
    assert(frames.select($"frame_idx").as[Int].collect().sorted.toSeq == Seq(0, 2))
  }

  test("approx_count_distinct within 5% of exact on documents fixture") {
    val docs = Tables.documents
    val (exact, approx) = docs.agg(
      countDistinct($"text").cast("double"),
      approx_count_distinct($"text").cast("double"))
      .as[(Double, Double)].collect().head
    assert(math.abs(approx - exact) / exact < 0.05, s"exact=$exact approx=$approx")
  }

  test("semanticDedup: drop rule matches a brute-force model; one survivor per dup group") {
    val base = clustered(60, 16)
    // plant exact dups of three members — each group must keep exactly
    // its min-id member
    val withDups = base ++ Seq(
      (200L, base(0)._2.clone()), (201L, base(0)._2.clone()),
      (210L, base(1)._2.clone()))
    val df = withDups.toDF("vec_id", "embedding")
    val model = graft.ops.Ivf.train(df, "vec_id", "embedding", k = 4)
    val got = Similarity.semanticDedup(df, "vec_id", "embedding", model, tau = 0.999)
      .select($"id", $"cluster", $"kept").as[(Long, Long, Boolean)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got.size == withDups.size)
    // brute-force model: same cluster assignment (from the plan), drop iff
    // a lower-id same-cluster member has rounded cosine >= tau
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      if (na * nb > 0) d / (na * nb) else Double.NaN
    }
    val vecs = withDups.toMap
    withDups.foreach { case (id, v) =>
      val (cl, kept) = got(id)
      val expectDrop = withDups.exists { case (oid, ov) =>
        oid < id && got(oid)._1 == cl &&
          BigDecimal(cos(ov, v)).setScale(6, BigDecimal.RoundingMode.HALF_UP) >= 0.999
      }
      assert(kept == !expectDrop, s"vec $id kept=$kept, model says drop=$expectDrop")
    }
    // exact-dup groups: min id survives, the rest don't
    assert(got(0L)._2 && !got(200L)._2 && !got(201L)._2)
    assert(got(1L)._2 && !got(210L)._2)
    // dup groups share their survivor's cluster
    assert(got(200L)._1 == got(0L)._1 && got(201L)._1 == got(0L)._1)
    assert(got(210L)._1 == got(1L)._1)
  }

  test("semanticDedup paper policy: the least-centroid-similar duplicate survives, min-id policy keeps the lowest id") {
    // one tight duplicate group far above tau, plus a singleton to keep
    // the clustering honest. v3 points furthest from the group's mean →
    // lowest centroid similarity → the paper's survivor; min-id keeps v1.
    val group = Seq(
      1L -> Array(1.00f, 0.00f, 0f, 0f),
      2L -> Array(0.99f, 0.10f, 0f, 0f),
      3L -> Array(0.90f, 0.30f, 0f, 0f))
    val other = Seq(50L -> Array(0f, 0f, 1f, 0f))
    val df = (group ++ other).toDF("vec_id", "embedding")
    val model = graft.ops.Ivf.train(df, "vec_id", "embedding", k = 2)
    def keptSet(paper: Boolean): Set[Long] =
      Similarity.semanticDedup(df, "vec_id", "embedding", model, tau = 0.9,
          keepLeastCentral = paper)
        .filter($"kept").select($"id").as[Long].collect().toSet
    val minId = keptSet(paper = false)
    val paper = keptSet(paper = true)
    assert(minId == Set(1L, 50L), s"min-id kept $minId")
    // brute-force the paper survivor: the group member with the lowest
    // rounded cosine to its cluster centroid
    def cos(a: Array[Float], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      d / (na * nb)
    }
    val centroids = model.centroids.map(_.map(_.toDouble))
    val groupCluster = group.map { case (id, v) =>
      id -> centroids.zipWithIndex.maxBy { case (c, i) => (cos(v, c), -i) }
    }
    val cid = groupCluster.head._2._2
    assert(groupCluster.forall(_._2._2 == cid), "group split across clusters")
    val leastCentral = group.minBy { case (id, v) =>
      (BigDecimal(cos(v, centroids(cid))).setScale(6, BigDecimal.RoundingMode.HALF_UP), id)
    }._1
    assert(leastCentral == 3L, s"fixture lost its point: least central = $leastCentral")
    assert(paper == Set(leastCentral, 50L), s"paper policy kept $paper")
  }

  test("semanticDedup paper policy: centroid-sim ties (exact dups) fall back to min-id") {
    val df = Seq(
      10L -> Array(1f, 0f, 0f, 0f),
      11L -> Array(1f, 0f, 0f, 0f),
      12L -> Array(1f, 0f, 0f, 0f)).toDF("vec_id", "embedding")
    val model = graft.ops.Ivf.train(df, "vec_id", "embedding", k = 1)
    val kept = Similarity.semanticDedup(df, "vec_id", "embedding", model,
        tau = 0.999, keepLeastCentral = true)
      .filter($"kept").select($"id").as[Long].collect().toSet
    assert(kept == Set(10L), s"tie-break kept $kept")
  }

  private object Tables {
    def documents = spark.read.parquet(s"$sfDir/documents.parquet")
  }
}
