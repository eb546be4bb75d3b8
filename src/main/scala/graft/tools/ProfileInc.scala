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
    // ---- connector read-path isolation: same bucketed bytes through
    // three decoders, row counts asserted equal (VERDICT r7 #2). The
    // numbers quantify the decode tax the r7 Group-API reader paid and
    // the vectorized reader's parity with Spark's native parquet scan.
    locally {
      val m = graft.sinks.ManifestTable.currentManifest(spark, idx)
      val dirs = m.buckets.values.flatten.map(d => s"$idx/$d").toSeq
      val nParquet = spark.read.parquet(dirs: _*).count()
      val nVec = graft.sources.ManifestIndexSource.read(spark, idx).count()
      val nRow = spark.read.option("vectorized", "false")
        .table(s"${graft.sources.ManifestIndexSource.CatalogName}.`$idx`").count()
      require(nParquet == nVec && nVec == nRow,
        s"read paths disagree: parquet=$nParquet vectorized=$nVec row=$nRow")
      println(s"  read-path rows: $nParquet (all three equal)")
      time("read: spark.read.parquet (noop)") {
        spark.read.parquet(dirs: _*)
          .write.mode("overwrite").format("noop").save()
      }
      time("read: DSv2 vectorized (noop)") {
        graft.sources.ManifestIndexSource.read(spark, idx)
          .write.mode("overwrite").format("noop").save()
      }
      time("read: DSv2 row fallback (noop)") {
        spark.read.option("vectorized", "false")
          .table(s"${graft.sources.ManifestIndexSource.CatalogName}.`$idx`")
          .write.mode("overwrite").format("noop").save()
      }
    }

    // the index is ~64k narrow rows — decode differences drown in fixed
    // job overhead there. Repeat over a WIDE manifest table (sf lineitem,
    // 600k rows x 16 cols at sf0.1) where decode CPU dominates.
    locally {
      val tbl = s"$p/litbl"
      graft.sinks.ManifestTable.write(
        spark.read.parquet(s"$sfDir/lineitem.parquet"), tbl, "l_orderkey", 16)
      val m = graft.sinks.ManifestTable.currentManifest(spark, tbl)
      val dirs = m.buckets.values.flatten.map(d => s"$tbl/$d").toSeq
      val cat = graft.sources.ManifestIndexSource.CatalogName
      graft.sources.ManifestIndexSource.ensureRegistered(spark)
      val nParquet = spark.read.parquet(dirs: _*).count()
      val nVec = spark.read.table(s"$cat.`$tbl`").count()
      require(nParquet == nVec,
        s"lineitem read paths disagree: $nParquet/$nVec")
      println(s"  lineitem read-path rows: $nParquet (both equal)")
      time("lineitem full: spark.read.parquet (noop)") {
        spark.read.parquet(dirs: _*)
          .write.mode("overwrite").format("noop").save()
      }
      time("lineitem full: DSv2 vectorized (noop)") {
        spark.read.table(s"$cat.`$tbl`")
          .write.mode("overwrite").format("noop").save()
      }
      // the Group-API fallback's surface excludes timestamps — compare
      // the two DSv2 decoders on the projection both can read
      val rowSafe = spark.read.table(s"$cat.`$tbl`").schema.fields
        .filter { f =>
          f.dataType != org.apache.spark.sql.types.TimestampType &&
            f.dataType != org.apache.spark.sql.types.TimestampNTZType
        }
        .map(f => col(f.name)).toSeq
      time("lineitem non-ts: DSv2 vectorized (noop)") {
        spark.read.table(s"$cat.`$tbl`").select(rowSafe: _*)
          .write.mode("overwrite").format("noop").save()
      }
      time("lineitem non-ts: DSv2 row fallback (noop)") {
        spark.read.option("vectorized", "false").table(s"$cat.`$tbl`")
          .select(rowSafe: _*)
          .write.mode("overwrite").format("noop").save()
      }
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
