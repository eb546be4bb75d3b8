package graft

import java.nio.file.{Files, Paths}
import graft.sinks.MockPoster
import graft.streaming.SendStream

class SendStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streaming send: micro-batch distribution → fan-out → ledger append") {
    val base = Files.createTempDirectory("graft-send").toString
    val landing = s"$base/landing"
    Files.createDirectories(Paths.get(landing))
    // two request files = two micro-batch candidates
    Files.writeString(Paths.get(s"$landing/b1.json"),
      (1 to 7).map(i => s"""{"c_custkey":$i,"c_name":"c$i"}""").mkString("\n"))
    Files.writeString(Paths.get(s"$landing/b2.json"),
      (8 to 12).map(i => s"""{"c_custkey":$i,"c_name":"c$i"}""").mkString("\n"))

    val webhooks = Seq((1L, "http://wh-1", "w1"), (2L, "http://wh-2", "w2"))
      .toDF("webhook_key", "url", "webhook_name")
    val poster = new MockPoster()
    val q = SendStream.start(spark, landing, s"$base/ledger", webhooks,
      poster, capacity = 4, employeeRange = "1-10",
      rateLimit = 10, intervalMs = 50)
    q.awaitTermination(120000)

    // capacity 4 × 2 webhooks = 8 assigned per micro-batch at most;
    // batch1: 7 rows → all assigned; batch2: 5 rows → all assigned
    val ledger = spark.read.parquet(s"$base/ledger")
    assert(ledger.count() == 12)
    assert(poster.calls.size() == 12)
    // payloads carry the metadata envelope
    val sample = poster.calls.peek()._2
    assert(sample.contains("\"_batch_metadata\""))
    assert(sample.contains("\"source\":\"hq-data-warehouse\""))
    // per-batch ids distinct
    val batchIds = ledger.select($"batch_id").distinct().as[String].collect().toSet
    assert(batchIds.size == 2)
    // minted ledger ids unique
    assert(ledger.select($"id").distinct().count() == 12)
  }
}
