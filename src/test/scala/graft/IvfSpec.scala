package graft

import org.apache.spark.sql.functions._
import graft.ops.{Ivf, Similarity}
import graft.GraftExtensions

class IvfSpec extends SparkSpec {
  import spark.implicits._

  private def clustered(n: Int, dim: Int): Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(11)
    val centers = Array.fill(4, dim)(rnd.nextGaussian().toFloat)
    (0 until n).map { i =>
      val c = centers(i % 4)
      (i.toLong, c.map(x => x + 0.05f * rnd.nextGaussian().toFloat))
    }
  }

  test("IVF: train is deterministic; index assigns cluster-mates to the same list") {
    val df = clustered(200, 12).toDF("vec_id", "embedding")
    val m1 = Ivf.train(df, "vec_id", "embedding", k = 4)
    val m2 = Ivf.train(df, "vec_id", "embedding", k = 4)
    assert(m1.centroids.map(_.toSeq).toSeq == m2.centroids.map(_.toSeq).toSeq)
    val assigned = Ivf.index(df, "embedding", m1)
      .select($"vec_id", $"list_id").as[(Long, Int)].collect().toMap
    // vectors from the same generator cluster should mostly co-locate
    val byTrueCluster = assigned.groupBy { case (id, _) => id % 4 }
      .map { case (_, m) =>
        val counts = m.values.groupBy(identity).map(_._2.size)
        counts.max.toDouble / m.size
      }
    assert(byTrueCluster.forall(_ >= 0.9), s"purity $byTrueCluster")
  }

  test("IVF search recall ≥ 0.8 vs brute force on clustered data") {
    val df = clustered(200, 12).toDF("vec_id", "embedding")
    val queries = df.filter($"vec_id" < 12)
    val model = Ivf.train(df, "vec_id", "embedding", k = 4)
    val brute = Similarity.bruteForceTopK(df, queries, "vec_id", "embedding", k = 3)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Ivf.searchTopK(df, queries, "vec_id", "embedding", k = 3,
        model, nProbe = 2)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = brute.intersect(ivf).size.toDouble / brute.size
    assert(recall >= 0.8, s"recall $recall")
  }

  test("ivf_recall gate query: mean recall@5 ≥ 0.8 on the fixture embeddings") {
    val recalls = graft.queries.ExtendedQueries
      .ivfRecall(spark, sfDir)
      .select($"recall_at_5").as[Double].collect()
    assert(recalls.length == 10)
    val mean = recalls.sum / recalls.length
    assert(mean >= 0.8 - 1e-9, s"mean recall@5 $mean (per-query: ${recalls.toSeq})")
  }

  test("SQL registration: custom expressions callable from spark.sql") {
    GraftExtensions.register(spark)
    spark.read.parquet(s"$sfDir/documents.parquet").createOrReplaceTempView("docs_sql")
    val viaSql = spark.sql(
      """SELECT doc_id, poly_hash(text, 1000000007) AS fp,
        |       simhash(text) AS sh,
        |       minhash_sig(text, 2, 8) AS sig
        |FROM docs_sql ORDER BY doc_id LIMIT 5""".stripMargin).collect()
    assert(viaSql.length == 5)
    assert(viaSql.forall(_.getAs[Seq[Long]]("sig").length == 8))
    val dotViaSql = spark.sql(
      "SELECT dot_product(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d")
      .as[Double].collect().head
    assert(dotViaSql == 11.0)
    // the BPE kernels round-trip through SQL too
    val bpe = spark.sql(
      """SELECT adjacent_pairs(array('a','b','c')) AS p,
        |       bpe_merge(array('a','b','c'), 'a', 'b') AS m""".stripMargin).collect().head
    assert(bpe.getSeq[org.apache.spark.sql.Row](bpe.fieldIndex("p"))
      .map(r => (r.getString(0), r.getString(1))).toSeq == Seq(("a", "b"), ("b", "c")))
    assert(bpe.getSeq[String](bpe.fieldIndex("m")).toSeq == Seq("a b", "c"))
  }
  test("autoProbe: exact ceiling widening, clamped to [base, nLists]") {
    // s = allowed/corpus; need = ceil(base·corpus/allowed), all-integer
    assert(Ivf.autoProbe(2, 8, 1000L, 500L) == 4)   // s=1/2  → 4
    assert(Ivf.autoProbe(2, 8, 1000L, 334L) == 6)   // ceil(5.99) = 6
    assert(Ivf.autoProbe(2, 8, 1000L, 333L) == 7)   // ceil(6.006) = 7
    assert(Ivf.autoProbe(2, 8, 999L, 333L) == 6)    // exact 6 — no +1
    // permissive filters never NARROW the search (clamp low = base)
    assert(Ivf.autoProbe(2, 8, 1000L, 1000L) == 2)
    assert(Ivf.autoProbe(2, 8, 1000L, 4000L) == 2)  // allowed ⊃ indexed
    // selective filters saturate at probe-all (the exact regime)
    assert(Ivf.autoProbe(2, 8, 1000L, 10L) == 8)
    // empty allowed set → probe-all (any probe returns nothing anyway)
    assert(Ivf.autoProbe(2, 8, 1000L, 0L) == 8)
    // unknown corpus count → no widening, never a guess
    assert(Ivf.autoProbe(2, 8, -1L, 500L) == 2)
    assert(Ivf.autoProbe(2, 8, 0L, 500L) == 2)
    // base beyond nLists clamps down even unfiltered
    assert(Ivf.autoProbe(9, 8, -1L, 500L) == 8)
    assert(Ivf.autoProbe(9, 8, 1000L, 1000L) == 8)
    // no Long overflow: base·corpus at extreme corpus sizes
    assert(Ivf.autoProbe(64, 1024, 1L << 40, 1L) == 1024)
    intercept[IllegalArgumentException](Ivf.autoProbe(0, 8, 10L, 5L))
    intercept[IllegalArgumentException](Ivf.autoProbe(2, 0, 10L, 5L))
  }
}
