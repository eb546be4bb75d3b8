package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.ops.{Dedup, TextAnalysis}

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
    // warmup pass
    noop(docs.select(count(lit(1))))

    // structure probe: distinct fingerprints and band-bucket occupancy
    val withSim = docs.select(col("doc_id").as("id"),
      graft.functions.Sketches.simhash(col("text")).as("sh"))
    withSim.agg(count(lit(1)).as("n"), countDistinct(col("sh")).as("n_sh")).show()
    val banded = withSim.select(col("id"), col("sh"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("sh"), b * 15).bitwiseAND(0x7FFFL).as("bh"))): _*)).as("bk"))
      .select(col("id"), col("sh"), col("bk.band"), col("bk.bh"))
    banded.groupBy("band", "bh")
      .agg(count(lit(1)).as("k"), countDistinct(col("sh")).as("k_sh"))
      .orderBy(desc("k")).show(10)
    val pairs0 = Dedup.simhashNearDupPairs(docs, "doc_id", "text", maxDist = 3)
    println(s"[prof] near-dup pairs: ${pairs0.count()}")

    (1 to 2).foreach { pass =>
      println(s"--- pass $pass ---")
      val pairs = Dedup.simhashNearDupPairs(docs, "doc_id", "text", maxDist = 3)
        .select("id_l", "id_r")
      time("simhash_pairs")(noop(pairs))
      val clusters = time("connected_components")(
        Dedup.connectedComponents(docs.select("doc_id"), "doc_id", pairs))
      time("cc_materialize")(noop(clusters))
      val sizes = clusters.groupBy("cluster")
        .agg(count(lit(1)).as("n_members")).filter(col("n_members") > 1)
      val members = clusters.join(sizes, Seq("cluster"))
        .join(docs.select(col("doc_id"), col("text")),
          clusters("id") === docs("doc_id"))
        .withColumn("quality", TextAnalysis.qualityScore(col("text")))
      time("rank_and_window") {
        import org.apache.spark.sql.expressions.Window
        noop(members
          .withColumn("rk", row_number().over(
            Window.partitionBy("cluster").orderBy(desc("quality"), col("doc_id"))))
          .filter(col("rk") === 1))
      }
    }
    spark.stop()
  }
}
