package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.ops.Dedup

/** Ad-hoc stage-by-stage timing of composite queries (local profiling
  * only — not part of the driver contract).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.setCheckpointDir(
      s"${System.getProperty("java.io.tmpdir")}/graft-checkpoints")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    val docs = Tables.documents(spark, sfDir)
    noop(docs.select(count(lit(1)))) // warmup

    // bucket structure probe: pre-distinct pair volume
    {
      val prepared = Dedup.prepareMinhash(docs, "doc_id", "text",
        shingleN = 2, numHashes = 64, bands = 32)
      val exploded = prepared.select(col("id"),
        posexplode(col("bands")).as(Seq("band", "bh")))
      val bk = exploded.groupBy("band", "bh").agg(count(lit(1)).as("k"))
        .filter(col("k") > 1)
      bk.agg(sum(col("k") * (col("k") - 1) / 2).as("pre_distinct_pairs"),
        max(col("k")).as("max_bucket"), count(lit(1)).as("n_buckets")).show()
    }

    // source_overlap breakdown
    {
      import graft.functions.Sketches
      (1 to 2).foreach { pass =>
        println(s"--- so pass $pass ---")
        val grams = docs.select(col("source"),
          explode(array_distinct(Sketches.word_ngrams(col("text"), 5))).as("gram"))
        time("so_grams")(noop(grams))
        val byGram = grams.groupBy("gram")
          .agg(array_sort(collect_set(col("source"))).as("ss"))
        time("so_bygram")(noop(byGram))
        time("so_full")(noop(graft.queries.ExtendedQueries.sourceOverlap(spark, sfDir)))
      }
    }

    // ngram_jaccard_pairs funnel volumes: candidates, est>=0.2 survivors,
    // and the top-20 exact-jaccard floor — the numbers that decide whether
    // the r06 bench anomaly was candidate volume or environment variance
    {
      Seq((32, "r=2 thr~0.18"), (16, "r=4 thr~0.50")).foreach { case (bands, label) =>
        val prepared = Dedup.prepareMinhash(docs, "doc_id", "text",
          shingleN = 2, numHashes = 64, bands = bands)
        val cands = Dedup.candidatePairs(prepared, "id", "bands")
        val sigs = prepared.select(col("id"), col("sig"))
        val est = cands
          .join(sigs.withColumnRenamed("id", "id_l").withColumnRenamed("sig", "sig_l"), "id_l")
          .join(sigs.withColumnRenamed("id", "id_r").withColumnRenamed("sig", "sig_r"), "id_r")
          .withColumn("est", Dedup.estJaccard(col("sig_l"), col("sig_r"), 64))
        val nC = cands.count()
        val nS = est.filter(col("est") >= 0.2).count()
        val side = prepared.select(col("id"), col("shingles"))
        val top = est.filter(col("est") >= 0.2).select("id_l", "id_r")
          .join(side.withColumnRenamed("id", "id_l").withColumnRenamed("shingles", "sh_l"), "id_l")
          .join(side.withColumnRenamed("id", "id_r").withColumnRenamed("shingles", "sh_r"), "id_r")
          .withColumn("jaccard", graft.functions.Sketches.jaccard(col("sh_l"), col("sh_r")))
          .orderBy(desc("jaccard")).limit(20)
          .select("jaccard").collect().map(_.getDouble(0))
        println(s"[prof] bands=$bands ($label): candidates=$nC est>=0.2 " +
          s"survivors=$nS top20_floor=${if (top.length == 20) top.last else -1.0} " +
          s"top20_n=${top.length}")
      }
    }

    val numHashes = 64
    (1 to 2).foreach { pass =>
      println(s"--- pass $pass ---")
      val prepared = Dedup.prepareMinhash(docs, "doc_id", "text",
        shingleN = 2, numHashes = numHashes, bands = 32)
      time("prepare_minhash")(noop(prepared))
      time("prep_no_shingles")(noop(prepared.select(col("id"), col("sig"), col("bands"))))
      val exploded = prepared.select(col("id"),
        posexplode(col("bands")).as(Seq("band", "bh")))
      time("exploded")(noop(exploded))
      val bkt = exploded.groupBy("band", "bh")
        .agg(collect_list(col("id")).as("ids")).filter(size(col("ids")) > 1)
      time("buckets")(noop(bkt))
      val cands = Dedup.candidatePairs(prepared, "id", "bands")
      time("candidate_pairs")(noop(cands))
      println(s"[prof] n_cands = ${cands.count()}")
      val sigs = prepared.select(col("id"), col("sig"))
      val joined = cands
        .join(sigs.withColumnRenamed("id", "id_l").withColumnRenamed("sig", "sig_l"), "id_l")
        .join(sigs.withColumnRenamed("id", "id_r").withColumnRenamed("sig", "sig_r"), "id_r")
        .withColumn("est_jaccard", Dedup.estJaccard(col("sig_l"), col("sig_r"), numHashes))
        .select("id_l", "id_r", "est_jaccard")
      time("full_top_pairs")(noop(joined
        .orderBy(desc("est_jaccard"), col("id_l"), col("id_r")).limit(20)))
    }
    spark.stop()
  }
}
