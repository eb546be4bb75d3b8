package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.ops.{Dedup, IncrementalDedup}

/** Stage-by-stage wall-clock of the incremental_dedup probe — the
  * decomposition tool behind the r8 perf work (which stage pays for the
  * DSv2 read, the window, the intra leg). Times are warm (second run).
  */
object ProfileInc {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.documents(spark, sfDir)
    val batch = docs.filter(col("doc_id") % 10 >= 8)
    val p = java.nio.file.Files.createTempDirectory("graft-profinc")
    val idx = s"$p/index"
    IncrementalDedup.buildIndex(docs.filter(col("doc_id") % 10 < 8), idx,
      "doc_id", "text", shingleN = 2, numHashes = 64, bands = 16)

    def time[T](label: String)(f: => T): T = {
      f // warm
      val t0 = System.nanoTime()
      val r = f
      println(f"  $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    println(s"docs=${docs.count()} batch=${batch.count()}")

    time("full probe") {
      IncrementalDedup.probe(spark, idx, batch, "doc_id", "text",
        shingleN = 2, numHashes = 64, bands = 16, threshold = 0.5)
        .write.mode("overwrite").format("noop").save()
    }
    val prepared = time("prepare+localCheckpoint") {
      Dedup.prepareMinhash(batch, "doc_id", "text", 2, 64, 16).localCheckpoint()
    }
    val entries = prepared
      .select(col("id"), col("sig"), posexplode(col("bands")).as(Seq("band", "bh")))
      .select((col("band").cast("long") * graft.functions.Sketches.P1 + col("bh")).as("bandkey"),
        col("id"), col("sig"))
    time("DSv2 scan (count)") {
      graft.sources.ManifestIndexSource.read(spark, idx).count()
    }
    val slice = graft.sources.ManifestIndexSource.read(spark, idx)
    time("entries alone (noop)") {
      entries.write.mode("overwrite").format("noop").save()
    }
    time("candidate pair count") {
      println("    candidates=" + slice.alias("o").join(entries.alias("n"),
        col("o.bandkey") === col("n.bandkey"))
        .filter(col("o.id") =!= col("n.id")).count())
    }
    time("candidate count, DPP off") {
      spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "false")
      try println("    candidates=" + slice.alias("o").join(entries.alias("n"),
        col("o.bandkey") === col("n.bandkey"))
        .filter(col("o.id") =!= col("n.id")).count())
      finally spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    }
    time("candidate count, no sig cols") {
      println("    candidates=" + slice.select("bandkey", "id").alias("o")
        .join(entries.select("bandkey", "id").alias("n"),
          col("o.bandkey") === col("n.bandkey"))
        .filter(col("o.id") =!= col("n.id")).count())
    }
    time("window occ + filter (count)") {
      val w = org.apache.spark.sql.expressions.Window.partitionBy("bandkey")
      slice.withColumn("k", count(lit(1)).over(w))
        .withColumn("hub_id", min("id").over(w))
        .filter(col("k") <= 4096 || col("id") === col("hub_id")).count()
    }
    time("intra leg (noop)") {
      Dedup.estVerifiedPairs(prepared, 64, 0.5)
        .write.mode("overwrite").format("noop").save()
    }
    time("cross leg alone (noop)") {
      val w = org.apache.spark.sql.expressions.Window.partitionBy("bandkey")
      val capped = slice.withColumn("k", count(lit(1)).over(w))
        .withColumn("hub_id", min("id").over(w))
        .filter(col("k") <= 4096 || col("id") === col("hub_id"))
        .select("bandkey", "id", "sig")
      capped.alias("o").join(entries.alias("n"),
          col("o.bandkey") === col("n.bandkey"))
        .filter(col("o.id") =!= col("n.id"))
        .select(
          least(col("o.id"), col("n.id")).as("id_l"),
          greatest(col("o.id"), col("n.id")).as("id_r"),
          Dedup.estJaccard(col("o.sig"), col("n.sig"), 64).as("est_jaccard"))
        .filter(col("est_jaccard") >= 0.5)
        .write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
