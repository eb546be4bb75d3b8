package graft

import org.apache.spark.sql.functions._
import graft.ops.Ingest

class IngestSpec extends SparkSpec {
  import spark.implicits._

  val arrayBody =
    """[{"first_name":"Ada","last_name":"L","full_name":"Ada L",
      |"company_name":"Acme","job_title":"Eng","unknown_field":"dropme",
      |"_batch_metadata":{"batch_id":"b-7","batch_timestamp":"t",
      |"employee_range":"1-10","webhook_name":"w","source":"hq-data-warehouse"}},
      |{"first_name":null,"last_name":null,"full_name":null}]""".stripMargin.replaceAll("\n", "")

  val scalarBody =
    """{"first_name":"Solo","full_name":"Solo Person",
      |"_batch_metadata":{"batch_id":"b-9","batch_timestamp":"t",
      |"employee_range":"1-10","webhook_name":"w","source":"hq-data-warehouse"}}"""
      .stripMargin.replaceAll("\n", "")

  test("D6: array body explodes to N rows; scalar body wraps to 1 row") {
    val raw = Seq(arrayBody, scalarBody).toDF("body")
    val norm = Ingest.normalize(raw, "body")
    assert(norm.count() == 3)
  }

  test("P2: whitelist keeps exactly the 14 person fields, drops unknown + metadata") {
    val people = Ingest.whitelistProject(
      Ingest.normalize(Seq(arrayBody).toDF("body"), "body"))
    assert(people.columns.toSeq == graft.model.Dims.Schemas.clayFindPeopleColumns)
    val ada = people.filter($"first_name" === "Ada").collect().head
    assert(ada.getAs[String]("company_name") == "Acme")
    assert(ada.getAs[String]("domain") == null) // absent → NULL
  }

  test("D7/D8: one audit row per request with propagated batch id and counts") {
    val (people, audit) = Ingest.processRequest(
      Seq(arrayBody, scalarBody).toDF("body"), "body", sourceIp = "1.2.3.4")
    assert(people.count() == 3)
    val rows = audit.collect().map(r => r.getAs[String]("batch_id") -> r).toMap
    assert(rows.size == 2) // one audit row per request
    val a = rows("b-7")
    assert(a.getAs[Int]("records_received") == 2)
    assert(a.getAs[Int]("records_inserted") == 2) // reference inserts whatever parsed
    assert(a.getAs[String]("status") == "success")
    assert(a.getAs[String]("source_ip") == "1.2.3.4")
    assert(rows("b-9").getAs[Int]("records_received") == 1)
  }

  test("D8: empty-envelope batch id falls back to 'unknown'") {
    val noMeta = """[{"first_name":"X"}]"""
    val (_, audit) = Ingest.processRequest(Seq(noMeta).toDF("body"), "body", "ip")
    assert(audit.collect().head.getAs[String]("batch_id") == "unknown")
  }

  test("D8: malformed request → no people, one error audit row (reference catch-all)") {
    val (people, audit) = Ingest.processRequest(
      Seq("NOT VALID JSON").toDF("body"), "body", "ip")
    assert(people.count() == 0)
    val a = audit.collect().head
    assert(a.getAs[Int]("records_received") == 0)
    assert(a.getAs[String]("status") == "error")
    assert(a.getAs[String]("error_message") == "Invalid or empty payload")
  }
}
