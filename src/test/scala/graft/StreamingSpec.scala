package graft

import java.nio.file.{Files, Paths}
import graft.streaming.IngestStream

class StreamingSpec extends SparkSpec {

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
