package graft

import org.apache.spark.sql.functions._
import graft.ops.Relational

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("rangeBucket: NULL bucket, fuzzy substring bucket, raw passthrough") {
    val df = Seq(
      Some("1-10"), None, Some("~Not Sure~"), Some("not sure"),
      Some("1-10 ") // trailing space: no equality bucket but still counted raw
    ).toDF("r")
    val got = df.select(Relational.rangeBucket($"r").as("b"))
      .as[String].collect().toSeq
    assert(got == Seq("1-10", "unknown", "not sure", "not sure", "1-10 "))
  }

  test("excludeSent is NOT EXISTS, not NOT IN: null keys in ledger don't wipe result") {
    val companies = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    val sends = Seq(Option(1L), None).toDF("company_id")
    val got = Relational.excludeSent(companies, sends, "id", "company_id")
      .select("id").as[Long].collect().toSeq
    assert(got == Seq(2L)) // SQL NOT IN with a NULL would return 0 rows
  }

  test("fetchByIds: semi-join keeps no duplicate companies when ids repeat") {
    val companies = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "name")
    val ids = Seq(1L, 1L, 3L).toDF("cid")
    val got = Relational.fetchByIds(companies, ids, "id", "cid")
      .select("id").as[Long].collect().sorted.toSeq
    assert(got == Seq(1L, 3L))
  }

  test("page: deterministic offset/limit with tiebreaker") {
    val df = (1 to 10).map(i => (i, "same")).toDF("k", "name")
    val got = Relational.page(df, Seq($"name", $"k"), offset = 3, n = 4)
      .select("k").as[Int].collect().toSeq
    assert(got == Seq(4, 5, 6, 7))
  }

  test("entry smoke: flagship returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
