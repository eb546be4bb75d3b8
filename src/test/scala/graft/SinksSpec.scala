package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sinks.{MockPoster, RateLimitedFanout, Sinks}

class SinksSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-sink").toString

  test("S5/S6: append twice accumulates; returning hands back the batch") {
    val dir = tmp() + "/t"
    Sinks.append(Seq((1L, "a")).toDF("id", "v"), dir)
    val ret = Sinks.appendReturning(Seq((2L, "b")).toDF("id", "v"), dir)
    assert(ret.count() == 1)
    assert(spark.read.parquet(dir).count() == 2)
  }

  test("S6: insert-returning mints unique ids that match what hit disk") {
    val dir = tmp() + "/t"
    val ret = Sinks.appendReturning(
      Seq("a", "b", "c").toDF("v"), dir)
    assert(ret.columns.head == "id")
    val retIds = ret.select("id").as[String].collect().toSet
    assert(retIds.size == 3 && retIds.forall(id => id != null && id.nonEmpty))
    // a second read of the SAME returned frame yields the SAME ids
    // (uuid() is pinned, not lazily re-minted)
    assert(ret.select("id").as[String].collect().toSet == retIds)
    val onDisk = spark.read.parquet(dir).select("id").as[String].collect().toSet
    assert(onDisk == retIds)
  }

  test("S7/S8: snapshot update mutates only the keyed row; delete removes it") {
    val dir = tmp() + "/t"
    Seq((1L, "a", true), (2L, "b", true)).toDF("id", "name", "is_active")
      .write.parquet(dir)
    val upd = tmp() + "/u"
    Sinks.keyedUpdate(spark, dir, upd, "id", 1L,
      Map("name" -> lit("renamed"), "is_active" -> lit(false)))
    val rows = spark.read.parquet(upd).orderBy("id")
      .as[(Long, String, Boolean)].collect().toSeq
    assert(rows == Seq((1L, "renamed", false), (2L, "b", true)))
    val del = tmp() + "/d"
    Sinks.keyedDelete(spark, upd, del, "id", 1L)
    assert(spark.read.parquet(del).as[(Long, String, Boolean)].collect().toSeq
      == Seq((2L, "b", true)))
  }

  test("compact: many small appended files rewrite to the computed count") {
    val dir = tmp() + "/t"
    (1 to 20).foreach { i =>
      Sinks.append(Seq((i.toLong, s"v$i")).toDF("id", "v"), dir)
    }
    assert(new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet")) == 20)
    val out = tmp() + "/c"
    val n = Sinks.compact(spark, dir, out, targetBytes = 1L << 30)
    assert(n == 1)
    assert(new java.io.File(out).listFiles().count(_.getName.endsWith(".parquet")) == 1)
    assert(spark.read.parquet(out).count() == 20)
  }

  test("date-partitioned write: a day filter prunes partitions at plan time") {
    val dir = tmp() + "/t"
    val events = graft.model.Tables.events(spark, "/root/testdata/sf0.001")
    Sinks.writeDatePartitioned(events, "ts", dir)
    val all = spark.read.parquet(dir)
    val oneDay = all.filter($"event_date" === "2024-01-03")
    assert(oneDay.count() > 0)
    // planning-time pruning: execute ONE plan instance and read the
    // scan's own metrics — only that day's files are touched
    val qe = oneDay.queryExecution
    assert(qe.executedPlan.execute().count() > 0)
    val scan = qe.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    val filesRead = scan.metrics("numFiles").value
    assert(filesRead > 0 && filesRead < all.inputFiles.length,
      s"read $filesRead of ${all.inputFiles.length} files")
    val plan = oneDay.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_date"), plan.take(800))
  }

  test("D5: ledger rows mirror assignments with status 'sent' regardless of outcome") {
    val assigned = Seq((10L, 1L), (11L, 2L)).toDF("c_custkey", "webhook_key")
    val ledger = Sinks.ledgerRows(assigned, "1-10", "batch-1").collect()
    assert(ledger.length == 2)
    assert(ledger.forall(_.getAs[String]("status") == "sent"))
    assert(ledger.forall(_.getAs[String]("batch_id") == "batch-1"))
  }

  test("D3: fan-out posts every row, tallies failures, respects sub-batch pacing") {
    val poster = new MockPoster(failUrls = Set("http://bad"))
    val rows = ((1 to 25).map(i => ("http://ok", s"body-$i")) :+
      (("http://bad", "body-x"))).toDS().repartition(1)
    val t0 = System.nanoTime()
    val (sent, failed) = RateLimitedFanout.run(rows, poster,
      rateLimit = 10, intervalMs = 200)
    val elapsedMs = (System.nanoTime() - t0) / 1000000
    assert(sent == 25 && failed == 1)
    assert(poster.calls.size() == 26)
    // 26 rows @ 10/batch = 3 sub-batches → ≥2 inter-batch sleeps of 200ms
    assert(elapsedMs >= 400, s"no pacing: ${elapsedMs}ms")
  }

  test("D3: partition-parallel fan-out still posts exactly once per row") {
    val poster = new MockPoster()
    val rows = (1 to 40).map(i => (s"http://wh-${i % 4}", s"b$i")).toDS()
      .repartition(4, $"_1")
    val (sent, failed) = RateLimitedFanout.run(rows, poster,
      rateLimit = 10, intervalMs = 50)
    assert(sent == 40 && failed == 0)
    assert(poster.calls.size() == 40)
  }
}
