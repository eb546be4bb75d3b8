package graft

import org.apache.spark.sql.functions._
import graft.ops.Pq

class PqSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = spark.read.parquet(s"$sfDir/embeddings.parquet")

  test("PQ codes: m code BYTES per vector, all within [0, k)") {
    import graft.functions.MathExprs.int8ToLongs
    val model = Pq.train(fixture, "vec_id", "embedding",
      dim = 64, m = 8, k = 16, updates = 1)
    assert(model.m == 8 && model.k == 16 && model.subDim == 8)
    val bad = Pq.encode(fixture, "vec_id", "embedding", model)
      .select($"vec_id", explode(int8ToLongs($"codes")).as("c"))
      .filter($"c" < 0 || $"c" >= 16).count()
    assert(bad == 0L)
    // the persisted form really is 8 bytes per vector
    val arity = Pq.encode(fixture, "vec_id", "embedding", model)
      .filter(length($"codes") =!= 8).count()
    assert(arity == 0L)
  }

  /** 3 well-separated clusters in 64 dims — PQ's contract is preserving
    * COARSE geometry under 32× compression; on isotropic random data
    * (like the synthetic fixture) pairwise distances concentrate and
    * any coded representation's top-k is near chance, so recall is
    * asserted where the guarantee actually holds.
    */
  private def planted(n: Int): Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(13)
    val centers = Array.tabulate(3, 64)((c, i) =>
      (if (i % 3 == c) 8f else 0f) + rnd.nextGaussian().toFloat)
    (0 until n).map { i =>
      (i.toLong, centers(i % 3).map(x => x + 0.3f * rnd.nextGaussian().toFloat))
    }
  }

  test("ADC top-k stays inside the query's planted cluster") {
    val df = planted(90).toDF("vec_id", "embedding")
    val model = Pq.train(df, "vec_id", "embedding",
      dim = 64, m = 8, k = 16, updates = 1)
    val offCluster = Pq.searchTopK(df, df.filter($"vec_id" < 15),
        "vec_id", "embedding", topK = 3, model)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
      .count { case (q, n) => q % 3 != n % 3 }
    assert(offCluster == 0, s"$offCluster ADC hits crossed planted clusters")
  }

  test("training and search are deterministic across runs") {
    val emb = fixture
    def run() = {
      val model = Pq.train(emb, "vec_id", "embedding",
        dim = 64, m = 8, k = 16, updates = 1)
      Pq.searchTopK(emb, emb.filter($"vec_id" < 5), "vec_id", "embedding",
          topK = 5, model)
        .select($"query_id", $"neighbor_id", $"rank")
        .as[(Long, Long, Long)].collect().sortBy(t => (t._1, t._3)).toSeq
    }
    assert(run() == run())
  }
}
