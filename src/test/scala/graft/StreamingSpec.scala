package graft

import java.nio.file.{Files, Paths}
import graft.streaming.{DedupStream, IngestStream}

class StreamingSpec extends SparkSpec {

  test("dedup stream: first-seen-wins per fingerprint, state survives restart") {
    val base = Files.createTempDirectory("graft-dedup-stream").toString
    val landing = s"$base/landing"
    Files.createDirectories(Paths.get(landing))
    Files.writeString(Paths.get(s"$landing/a.txt"),
      "alpha doc\nbeta doc\nalpha doc\n") // in-batch dup
    val q = DedupStream.start(spark, landing, s"$base/out", s"$base/ckpt")
    q.awaitTermination(60000)
    val out1 = spark.read.parquet(s"$base/out")
    assert(out1.count() == 2)
    val swallowed = out1.collect()
      .map(r => r.getAs[String]("text") -> r.getAs[Long]("n_dups_swallowed")).toMap
    assert(swallowed("alpha doc") == 1L && swallowed("beta doc") == 0L)

    // re-land an old dup plus one new doc; restart from the checkpoint —
    // only the new doc comes out (keyed state persisted across restarts)
    Files.writeString(Paths.get(s"$landing/b.txt"), "alpha doc\ngamma doc\n")
    val q2 = DedupStream.start(spark, landing, s"$base/out", s"$base/ckpt")
    q2.awaitTermination(60000)
    val texts = spark.read.parquet(s"$base/out")
      .select("text").collect().map(_.getString(0)).toSeq
    assert(texts.length == 3 && texts.count(_ == "alpha doc") == 1
      && texts.contains("gamma doc"))
  }

  test("ingest stream: landing JSON → people + audit appended per micro-batch") {
    val base = Files.createTempDirectory("graft-stream").toString
    val landing = s"$base/landing"
    Files.createDirectories(Paths.get(landing))
    val body =
      """[{"first_name":"Ada","full_name":"Ada L","_batch_metadata":{"batch_id":"b-1","batch_timestamp":"t","employee_range":"1-10","webhook_name":"w","source":"hq-data-warehouse"}},{"first_name":"Bob","full_name":"Bob M"}]"""
    Files.writeString(Paths.get(s"$landing/req1.json"), body + "\n")

    val q = IngestStream.start(spark, landing,
      s"$base/people", s"$base/audit", s"$base/ckpt")
    q.awaitTermination(60000)

    val people = spark.read.parquet(s"$base/people")
    assert(people.count() == 2)
    assert(people.columns.toSeq == graft.model.Dims.Schemas.clayFindPeopleColumns)
    val audit = spark.read.parquet(s"$base/audit").collect().head
    assert(audit.getAs[String]("batch_id") == "b-1")
    assert(audit.getAs[Int]("records_received") == 2)
    assert(audit.getAs[String]("status") == "success")

    // second request lands → incremental micro-batch appends
    Files.writeString(Paths.get(s"$landing/req2.json"),
      """{"first_name":"Solo"}""" + "\n")
    val q2 = IngestStream.start(spark, landing,
      s"$base/people", s"$base/audit", s"$base/ckpt")
    q2.awaitTermination(60000)
    assert(spark.read.parquet(s"$base/people").count() == 3)
    assert(spark.read.parquet(s"$base/audit").count() == 2)
  }
}
