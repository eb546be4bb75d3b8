package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Bucketing: the persisted form of co-located joins. Writing both fact
  * tables bucketed on the join key lets repeated joins skip their
  * shuffles entirely — THE technique for a 100 TB ledger that's joined
  * on the same key by every dashboard query.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("join of two tables bucketed on the key plans with NO exchange") {
    val wh = Files.createTempDirectory("graft-wh").toString // external table paths
    val companies = (1L to 1000L).map(i => (i, s"c$i", s"seg${i % 5}"))
      .toDF("id", "name", "segment")
    val sends = (1L to 3000L).map(i => (i % 1000 + 1, s"wh-${i % 7}"))
      .toDF("company_id", "webhook")

    companies.write.mode("overwrite")
      .bucketBy(8, "id").sortBy("id")
      .option("path", s"$wh/companies_b").saveAsTable("companies_b")
    sends.write.mode("overwrite")
      .bucketBy(8, "company_id").sortBy("company_id")
      .option("path", s"$wh/sends_b").saveAsTable("sends_b")

    val joined = spark.table("companies_b")
      .join(spark.table("sends_b"),
        col("id") === col("company_id"))
      .groupBy("segment").agg(count(lit(1)).as("n"))

    val plan = joined.queryExecution.executedPlan.toString
    // the join itself must not shuffle either side (bucket co-location);
    // only the final single-column aggregate exchanges
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).toSeq
    assert(exchanges.size == 1, s"expected only the groupBy exchange:\n${plan.take(1200)}")
    assert(plan.contains("SortMergeJoin") || plan.contains("BroadcastHashJoin"))
    // and the answer is right
    val n = joined.agg(sum("n")).as[Long].collect().head
    assert(n == 3000L)
    spark.sql("DROP TABLE IF EXISTS companies_b")
    spark.sql("DROP TABLE IF EXISTS sends_b")
  }
}
