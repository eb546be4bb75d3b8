package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sinks.Sinks
import graft.sources.Readers

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType)))

  test("parquetEvolved: old and new schema batches read as one table, old rows null-fill") {
    val dir = Files.createTempDirectory("graft-evolve").toString + "/t"
    Seq((1L, "a"), (2L, "b")).toDF("id", "name")
      .write.mode("append").parquet(dir)
    Seq((3L, "c", "extra")).toDF("id", "name", "note")
      .write.mode("append").parquet(dir)
    val evolved = Readers.parquetEvolved(spark, dir)
    assert(evolved.columns.toSet == Set("id", "name", "note"))
    val rows = evolved.orderBy("id")
      .as[(Long, String, Option[String])].collect().toSeq
    assert(rows == Seq((1L, "a", None), (2L, "b", None), (3L, "c", Some("extra"))))
  }

  test("jsonLines: valid rows parse, malformed lines surface as corrupt") {
    val dir = Files.createTempDirectory("graft-src").toString
    Files.writeString(Paths.get(s"$dir/a.json"),
      """{"id":1,"name":"a"}
        |GARBAGE LINE
        |{"id":2,"name":"b"}""".stripMargin)
    val (valid, corrupt) = Readers.splitCorrupt(
      Readers.jsonLines(spark, dir, schema))
    assert(valid.orderBy("id").as[(Long, String)].collect().toSeq
      == Seq((1L, "a"), (2L, "b")))
    assert(corrupt.as[String].collect().toSeq == Seq("GARBAGE LINE"))
  }

  test("csv: schema enforced, bad row counted not dropped") {
    val dir = Files.createTempDirectory("graft-csv").toString
    Files.writeString(Paths.get(s"$dir/a.csv"),
      "id,name\n1,a\nnot_a_number,b\n3,c\n")
    val (valid, corrupt) = Readers.splitCorrupt(
      Readers.csv(spark, dir, schema))
    assert(valid.count() == 2)
    assert(corrupt.count() == 1)
  }

  test("merge: updates replace matched keys, new keys append, others untouched") {
    val existing = Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30))
      .toDF("id", "name", "v")
    val updates = Seq((2L, "b2", 21), (9L, "i", 90)).toDF("id", "name", "v")
    val merged = Sinks.merge(existing, updates, "id")
      .orderBy("id").as[(Long, String, Int)].collect().toSeq
    assert(merged == Seq((1L, "a", 10), (2L, "b2", 21), (3L, "c", 30), (9L, "i", 90)))
  }
}
