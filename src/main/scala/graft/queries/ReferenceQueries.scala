package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.{Dims, Tables}
import graft.ops.Relational

/** Oracle-registered restatements of the reference's query surface over the
  * driver fixtures (mapping in FIXTURES.md §C: companies→customer,
  * company_sends→orders, clay_webhooks→supplier).
  *
  * Conventions for the DuckDB hash-compare gate:
  *  - every output column aliased identically in Spark and oracle SQL;
  *  - every query totally ordered (unique tiebreaker) so row order is
  *    deterministic on both sides;
  *  - double aggregates rounded to 2 decimals on both sides (float sums
  *    are order-dependent; rounding removes ulp noise);
  *  - no uuid()/current_timestamp in oracle-registered outputs
  *    (SURVEY §7.4.1).
  */
object ReferenceQueries {

  /** The send-ledger stand-in: completed orders only ('F' = fulfilled =
    * "sent"). Every customer has ≥1 order in the fixtures, so the raw
    * table would make every anti-join empty; the status filter keeps the
    * ledger semantics (a row means "this company was sent").
    */
  private def sends(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir).filter(col("o_orderstatus") === "F")

  private val sendsSqlPred = "o_orderstatus = 'F'"

  /** S1+J1+A1+X4+O1 — the minimum slice (SURVEY §7.2): customers with no
    * completed order ("companies never sent"), counted per market segment
    * ("employee range"), NULL-safe bucket.
    */
  def availableByRange(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    Relational.excludeSent(c, sends(spark, dir), "c_custkey", "o_custkey")
      .groupBy(Relational.rangeBucket(col("c_mktsegment")).as("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("bucket")
  }

  private val availableByRangeSql =
    """SELECT CASE WHEN c_mktsegment IS NULL THEN 'unknown'
      |            WHEN lower(c_mktsegment) LIKE '%not sure%' THEN 'not sure'
      |            ELSE c_mktsegment END AS bucket,
      |       count(*) AS cnt
      |FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
      |GROUP BY 1 ORDER BY 1""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "available_by_range" -> ((s, d) => availableByRange(s, d))
  )

  val oracles: Map[String, String] = Map(
    "available_by_range" -> availableByRangeSql
  )
}
