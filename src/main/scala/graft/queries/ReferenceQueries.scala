package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.model.{Dims, Tables}
import graft.ops.{Distribution, Relational}

/** Oracle-registered restatements of the reference's query surface over the
  * driver fixtures (mapping in FIXTURES.md §C: companies→customer,
  * company_sends→orders filtered to completed status, clay_webhooks→supplier).
  *
  * Conventions for the DuckDB hash-compare gate:
  *  - every output column aliased identically in Spark and oracle SQL;
  *  - every query totally ordered (unique tiebreaker) so row order is
  *    deterministic on both sides;
  *  - double aggregates go through an exact decimal sum then cast back to
  *    double (`CAST(SUM(CAST(x AS DECIMAL(p,s))) AS DOUBLE)`): float sums
  *    are order-dependent, decimal sums are exact, and the final
  *    decimal→double conversion is identical in both engines — so the
  *    hashes match bit-for-bit;
  *  - derived integer columns cast to BIGINT (Spark's row_number etc. are
  *    32-bit, DuckDB's are 64-bit);
  *  - integer counts in DuckDB use `count(*) FILTER` not `sum(CASE)`
  *    (DuckDB's sum(int) is HUGEINT → float in pandas);
  *  - no timestamps in outputs (parquet INT96 vs DuckDB µs dtype mismatch)
  *    — dates/times are emitted as formatted strings;
  *  - no uuid()/current_timestamp in oracle-registered outputs
  *    (SURVEY §7.4.1).
  */
object ReferenceQueries {

  // ---------------------------------------------------------------------
  // Shared building blocks
  // ---------------------------------------------------------------------

  /** The send-ledger stand-in: completed orders only ('F' = fulfilled =
    * "sent"). Every customer has ≥1 order in the fixtures, so the raw
    * table would make every anti-join empty; the status filter keeps the
    * ledger semantics (a row means "this company was sent").
    */
  private def sends(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir).filter(col("o_orderstatus") === "F")

  /** Market-segment → employee-range assignment, the fixture analog of the
    * companies.employee_range column. Literal 5-row dim; always broadcast.
    */
  private val segmentRanges: Seq[(String, String)] = Seq(
    ("AUTOMOBILE", "1-10"),
    ("BUILDING", "11-50"),
    ("FURNITURE", "51-100"),
    ("HOUSEHOLD", "501-1000"),
    ("MACHINERY", "10001+")
  )

  private def segmentRangeDim(spark: SparkSession): DataFrame = {
    import spark.implicits._
    segmentRanges.toDF("c_mktsegment", "employee_range")
  }

  private val segmentRangeSqlValues: String =
    segmentRanges.map { case (s, r) => s"('$s', '$r')" }
      .mkString("(VALUES ", ", ", ")")

  private val dimSqlCte: String =
    s"""dim AS (SELECT * FROM ${Dims.employeeRangeDimSqlValues}),
       |seg AS (SELECT * FROM $segmentRangeSqlValues AS seg(c_mktsegment, employee_range))""".stripMargin

  /** Exact double aggregation: cast to decimal, sum exactly, back to
    * double. See class doc. */
  private def decSum(c: Column, precision: Int = 16, scale: Int = 4): Column =
    sum(c.cast(DecimalType(precision, scale))).cast("double")

  // ---------------------------------------------------------------------
  // Queries
  // ---------------------------------------------------------------------

  /** S1+J1+A1+X4+O1 — the minimum slice (SURVEY §7.2): customers with no
    * completed order ("companies never sent"), counted per market segment
    * ("employee range"), NULL-safe bucket. Reference: the dashboard's
    * available-companies count (companies/route.ts:28-37,55-79).
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

  /** F1+F6+J1+O1+O3 — the paginated company listing
    * (companies/route.ts:4-47): optional segment filter + exclude-sent
    * anti-join + ORDER BY name + OFFSET/LIMIT, with the unique tiebreaker
    * the reference lacks (SURVEY §7.4.2).
    */
  def pagedListing(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val filtered = Relational.conditionalFilter(c, Seq(
      Some(col("c_mktsegment") === "BUILDING"), // employee_range=… param present
      None // search param absent — F6: predicate only appended when present
    ))
    val avail = Relational.excludeSent(filtered, sends(spark, dir), "c_custkey", "o_custkey")
    Relational.page(avail, Seq(col("c_name"), col("c_custkey")), offset = 10, n = 20)
      .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
  }

  private val pagedListingSql =
    """SELECT c_custkey, c_name, c_acctbal, c_mktsegment
      |FROM customer c
      |WHERE c_mktsegment = 'BUILDING'
      |  AND NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
      |ORDER BY c_name, c_custkey LIMIT 20 OFFSET 10""".stripMargin

  /** A1+F2+F3 — the reference's 11-bucket dashboard count loop
    * (companies/route.ts:55-79) collapsed to one grouped aggregate:
    * NULL bucket, fuzzy ilike bucket, raw passthrough — over ALL rows.
    */
  def fuzzyBucketCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .groupBy(Relational.rangeBucket(col("c_mktsegment")).as("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("bucket")

  private val fuzzyBucketCountsSql =
    """SELECT CASE WHEN c_mktsegment IS NULL THEN 'unknown'
      |            WHEN lower(c_mktsegment) LIKE '%not sure%' THEN 'not sure'
      |            ELSE c_mktsegment END AS bucket,
      |       count(*) AS cnt
      |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin

  /** A2+J4+A5 — total vs sent per bucket with `remaining = total − sent`
    * (companies/route.ts:56-94 merged key-by-key in JS; page.tsx:204-208):
    * two grouped counts full-outer-joined on the bucket key, NULL-safe.
    */
  def sentVsTotal(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val bucket = Relational.rangeBucket(col("c_mktsegment")).as("bucket")
    val totals = c.groupBy(bucket).agg(count(lit(1)).as("total"))
    val sentCounts = Relational
      .fetchByIds(c, sends(spark, dir), "c_custkey", "o_custkey") // semi: has ≥1 send
      .groupBy(bucket).agg(count(lit(1)).as("sent"))
    totals.join(sentCounts, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("total"), lit(0L)).as("total"),
        coalesce(col("sent"), lit(0L)).as("sent"),
        (coalesce(col("total"), lit(0L)) - coalesce(col("sent"), lit(0L))).as("remaining"))
      .orderBy("bucket")
  }

  private val sentVsTotalSql =
    """WITH b AS (
      |  SELECT c_custkey,
      |         CASE WHEN c_mktsegment IS NULL THEN 'unknown'
      |              WHEN lower(c_mktsegment) LIKE '%not sure%' THEN 'not sure'
      |              ELSE c_mktsegment END AS bucket,
      |         EXISTS (SELECT 1 FROM orders o
      |                 WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F') AS is_sent
      |  FROM customer c)
      |SELECT bucket, count(*) AS total,
      |       count(*) FILTER (WHERE is_sent) AS sent,
      |       count(*) - count(*) FILTER (WHERE is_sent) AS remaining
      |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin

  /** S2+S3+F3 — scan statistics: exact rowcount, count-only predicate scan
    * (head:true), NULL-predicate count (companies/route.ts:15,64-69).
    * Catalyst prunes count(*) on parquet to a metadata-only scan.
    */
  def scanStats(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    c.agg(
      count(lit(1)).as("n_rows"),
      count(when(col("c_mktsegment") === "BUILDING", 1)).as("n_building"),
      count(when(col("c_mktsegment").isNull, 1)).as("n_null_segment"),
      countDistinct(col("c_mktsegment")).as("n_segments"))
  }

  private val scanStatsSql =
    """SELECT count(*) AS n_rows,
      |       count(*) FILTER (WHERE c_mktsegment = 'BUILDING') AS n_building,
      |       count(*) FILTER (WHERE c_mktsegment IS NULL) AS n_null_segment,
      |       count(DISTINCT c_mktsegment) AS n_segments
      |FROM customer""".stripMargin

  /** S4+O2 — ordered dimension scan: all webhooks newest-first
    * (webhooks/route.ts:8-11); suppliers stand in, keyed order.
    */
  def orderedDimScan(spark: SparkSession, dir: String): DataFrame =
    Tables.supplier(spark, dir).orderBy(desc("s_suppkey"))

  private val orderedDimScanSql =
    "SELECT * FROM supplier ORDER BY s_suppkey DESC"

  /** F2 — case-insensitive LIKE bucket match (ilike '%not sure%',
    * companies/route.ts:19-22) restated over part types.
    */
  def filterIlike(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .filter(col("p_type").ilike("%eCoNoMy%"))
      .groupBy("p_brand").agg(count(lit(1)).as("cnt"))
      .orderBy("p_brand")

  private val filterIlikeSql =
    """SELECT p_brand, count(*) AS cnt FROM part
      |WHERE p_type ILIKE '%eCoNoMy%' GROUP BY p_brand ORDER BY p_brand""".stripMargin

  /** F4+J2 — fetch companies whose id ∈ batch (send/route.ts:39-42). The
    * reference chunks ids 100-per-query for URL limits (D2); one `isin`
    * (or semi-join at scale) replaces the chunking.
    */
  def fetchByIds(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .filter(col("c_custkey").isin(3L, 7L, 11L, 19L, 23L, 42L, 77L, 101L))
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")

  private val fetchByIdsSql =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE c_custkey IN (3, 7, 11, 19, 23, 42, 77, 101)
      |ORDER BY c_custkey""".stripMargin

  /** J3 — the FK lookup the reference declares but never joins
    * (supabase-schema.sql:18, sends→webhooks): ledger rows joined to their
    * dimension, grouped per webhook. lineitem⋈supplier stands in; the dim
    * side is broadcast (1000 rows at sf0.1).
    */
  def fkLookupJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val s = Tables.supplier(spark, dir)
    li.join(broadcast(s), li("l_suppkey") === s("s_suppkey"), "left")
      .groupBy("s_name")
      .agg(count(lit(1)).as("n_items"),
        decSum(col("l_extendedprice"), 18, 2).as("revenue"))
      .orderBy("s_name")
  }

  private val fkLookupJoinSql =
    """SELECT s_name, count(*) AS n_items,
      |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM lineitem LEFT JOIN supplier ON l_suppkey = s_suppkey
      |GROUP BY s_name ORDER BY s_name""".stripMargin

  /** J5+X1+D9+X9 — capacity planning over the constant dimension
    * (types/index.ts:69-85, page.tsx:152-155): per-range
    * `capacity = floor(40000 / max_employees)` and
    * `will_send = min(batchSize, capacity × numWebhooks)`.
    */
  def rangeCapacity(spark: SparkSession, dir: String): DataFrame = {
    val numWebhooks = lit(10L)
    val batchSize = lit(500L)
    Dims.employeeRangeDim(spark)
      .select(col("employee_range"), col("ord").cast("long").as("ord"),
        col("max_employees").cast("long").as("max_employees"))
      .withColumn("capacity", expr(s"${Dims.SafePeopleLimit} div max_employees"))
      .withColumn("will_send", least(batchSize, col("capacity") * numWebhooks))
      .orderBy("ord")
  }

  private val rangeCapacitySql =
    s"""SELECT employee_range, CAST(ord AS BIGINT) AS ord,
       |       CAST(max_employees AS BIGINT) AS max_employees,
       |       CAST(40000 // max_employees AS BIGINT) AS capacity,
       |       least(500, CAST(40000 // max_employees AS BIGINT) * 10) AS will_send
       |FROM ${Dims.employeeRangeDimSqlValues}
       |ORDER BY ord""".stripMargin

  /** D1+J5+J6+X1 — the heart of the app: capacity-bounded greedy
    * distribution (send/route.ts:63-81). Companies of one range, in the
    * reference's order (name, then unique key), are sliced into
    * consecutive buckets of `capacity = floor(40000/max_employees)` and
    * each bucket is assigned to the webhook with that index; companies
    * whose bucket ≥ numWebhooks stay unassigned.
    *
    * Spark shape: scalable global rank (range-partition + per-partition
    * index offsets, `Distribution.rankGlobalScalable` — no single-
    * partition window at any scale) → integer-div bucket → equi-join to
    * the indexed webhook dim. The rank is deterministic (total order on
    * name + unique key), so the query stays oracle-registered.
    */
  def distributionAssign(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).filter(col("c_mktsegment") === "MACHINERY")
    val withRange = c.join(broadcast(segmentRangeDim(spark)), Seq("c_mktsegment"))
      .join(broadcast(Dims.employeeRangeDim(spark)), Seq("employee_range"))
      .withColumn("capacity", expr(s"CAST(${Dims.SafePeopleLimit} div max_employees AS BIGINT)"))
    val ranked = Distribution
      .rankGlobalScalable(withRange, Seq(col("c_name"), col("c_custkey")))
      .withColumn("bucket", expr("(rn - 1) div capacity"))
    val webhooks = Distribution
      .rankGlobalScalable(Tables.supplier(spark, dir), Seq(col("s_suppkey")))
      .withColumn("widx", col("rn") - 1)
      .drop("rn")
    // the rank's RDD boundary hides source stats — keep the tiny webhook
    // dim explicitly broadcast so the bucket join never shuffles the fact
    ranked.join(broadcast(webhooks), ranked("bucket") === webhooks("widx"), "inner")
      .select(col("c_custkey"), col("c_name"),
        col("s_suppkey").as("webhook_key"), col("s_name").as("webhook_name"),
        col("rn"), col("bucket"))
      .orderBy("rn")
  }

  private val distributionAssignSql =
    s"""WITH $dimSqlCte,
       |comp AS (
       |  SELECT c.c_custkey, c.c_name,
       |         CAST(40000 // d.max_employees AS BIGINT) AS capacity,
       |         row_number() OVER (ORDER BY c.c_name, c.c_custkey) AS rn
       |  FROM customer c
       |  JOIN seg ON c.c_mktsegment = seg.c_mktsegment
       |  JOIN dim d ON seg.employee_range = d.employee_range
       |  WHERE c.c_mktsegment = 'MACHINERY'),
       |wh AS (SELECT s_suppkey, s_name,
       |              row_number() OVER (ORDER BY s_suppkey) - 1 AS widx
       |       FROM supplier)
       |SELECT comp.c_custkey, comp.c_name, wh.s_suppkey AS webhook_key,
       |       wh.s_name AS webhook_name, CAST(comp.rn AS BIGINT) AS rn,
       |       CAST((comp.rn - 1) // capacity AS BIGINT) AS bucket
       |FROM comp JOIN wh ON (comp.rn - 1) // capacity = wh.widx
       |ORDER BY rn""".stripMargin

  /** D1 remainder — `companiesNotAssigned` (send/route.ts:170): companies
    * whose bucket exceeds the webhook count stay behind.
    */
  def distributionUnassigned(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).filter(col("c_mktsegment") === "MACHINERY")
    val withRange = c.join(broadcast(segmentRangeDim(spark)), Seq("c_mktsegment"))
      .join(broadcast(Dims.employeeRangeDim(spark)), Seq("employee_range"))
      .withColumn("capacity", expr(s"CAST(${Dims.SafePeopleLimit} div max_employees AS BIGINT)"))
    // webhook count as a broadcast scalar subquery — query construction
    // stays lazy (no driver action while building the plan)
    val nWebhooks = Tables.supplier(spark, dir).agg(count(lit(1)).as("n_webhooks"))
    Distribution.rankGlobalScalable(withRange, Seq(col("c_name"), col("c_custkey")))
      .withColumn("bucket", expr("(rn - 1) div capacity"))
      .crossJoin(broadcast(nWebhooks))
      .filter(col("bucket") >= col("n_webhooks"))
      .agg(count(lit(1)).as("unassigned"))
  }

  private val distributionUnassignedSql =
    s"""WITH $dimSqlCte,
       |comp AS (
       |  SELECT CAST(40000 // d.max_employees AS BIGINT) AS capacity,
       |         row_number() OVER (ORDER BY c.c_name, c.c_custkey) AS rn
       |  FROM customer c
       |  JOIN seg ON c.c_mktsegment = seg.c_mktsegment
       |  JOIN dim d ON seg.employee_range = d.employee_range
       |  WHERE c.c_mktsegment = 'MACHINERY')
       |SELECT count(*) AS unassigned FROM comp
       |WHERE (rn - 1) // capacity >= (SELECT count(*) FROM supplier)""".stripMargin

  /** A4+A5 — per-webhook send-result tally (send/route.ts:88-92,125-128):
    * ok/failed counts per target. Events stand in: an 'error' event is a
    * failed POST, everything else succeeded.
    */
  def sendSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(concat(lit("wh-"), (col("user_id") % 5).cast("string")).as("webhook"))
      .agg(
        count(when(col("event_type") =!= "error", 1)).as("sent"),
        count(when(col("event_type") === "error", 1)).as("failed"),
        count(lit(1)).as("attempted"))
      .orderBy("webhook")

  private val sendSummarySql =
    """SELECT 'wh-' || CAST(user_id % 5 AS VARCHAR) AS webhook,
      |       count(*) FILTER (WHERE event_type <> 'error') AS sent,
      |       count(*) FILTER (WHERE event_type = 'error') AS failed,
      |       count(*) AS attempted
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  /** D6+P2+X4+X8 — the ingest normalization path (clay-webhook/index.ts:
    * 47-91): parse the JSON payload, whitelist-project with null-coalesce,
    * then aggregate per record type.
    */
  def ingestNormalize(spark: SparkSession, dir: String): DataFrame = {
    val propsSchema = StructType(Seq(StructField("k", IntegerType)))
    Tables.events(spark, dir)
      .withColumn("p", from_json(col("props"), propsSchema))
      .select(col("event_id"), col("event_type"),
        coalesce(col("p.k"), lit(-1)).as("k")) // P2: whitelist + null default
      .groupBy("event_type")
      .agg(count(lit(1)).as("received"),
        count(when(col("k") >= 0, 1)).as("with_key"),
        sum(col("k").cast("long")).as("sum_k"))
      .orderBy("event_type")
  }

  private val ingestNormalizeSql =
    """WITH p AS (
      |  SELECT event_id, event_type,
      |         coalesce(CAST(regexp_extract(props, '"k": (-?\d+)', 1) AS INT), -1) AS k
      |  FROM events)
      |SELECT event_type, count(*) AS received,
      |       count(*) FILTER (WHERE k >= 0) AS with_key,
      |       CAST(sum(k) AS BIGINT) AS sum_k
      |FROM p GROUP BY event_type ORDER BY event_type""".stripMargin

  /** D7+D8 — per-batch ingest audit rows (clay-webhook/index.ts:58-140):
    * batch id propagated through the envelope, received/inserted counts,
    * success/partial status.
    */
  def ingestAudit(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(concat(lit("batch-"), (col("user_id") % 7).cast("string")).as("batch_id"))
      .agg(
        count(lit(1)).as("records_received"),
        count(when(col("event_type") =!= "error", 1)).as("records_inserted"))
      .withColumn("status",
        when(col("records_received") === col("records_inserted"), "success")
          .otherwise("partial"))
      .orderBy("batch_id")

  private val ingestAuditSql =
    """SELECT 'batch-' || CAST(user_id % 7 AS VARCHAR) AS batch_id,
      |       count(*) AS records_received,
      |       count(*) FILTER (WHERE event_type <> 'error') AS records_inserted,
      |       CASE WHEN count(*) = count(*) FILTER (WHERE event_type <> 'error')
      |            THEN 'success' ELSE 'partial' END AS status
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  /** D4+X8+X6 — outbound payload assembly (send/route.ts:102-111): each
    * row wrapped with a `_batch_metadata` struct and serialized to JSON.
    * Batch id/timestamp are fixed literals here (minting is sink-side,
    * SURVEY §7.4.1).
    */
  def batchMetadataJson(spark: SparkSession, dir: String): DataFrame = {
    val meta = struct(
      lit("batch-0001").as("batch_id"),
      lit("2026-01-01T00:00:00.000Z").as("batch_timestamp"),
      lit("11-50").as("employee_range"),
      lit("wh-0").as("webhook_name"),
      lit("hq-data-warehouse").as("source"))
    Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .orderBy("c_custkey").limit(5)
      .select(col("c_custkey"),
        to_json(struct(col("c_custkey"), col("c_name"), meta.as("_batch_metadata")))
          .as("payload"))
      .orderBy("c_custkey")
  }

  private val batchMetadataJsonSql =
    """SELECT c_custkey,
      |       '{"c_custkey":' || CAST(c_custkey AS VARCHAR) ||
      |       ',"c_name":"' || c_name ||
      |       '","_batch_metadata":{"batch_id":"batch-0001",' ||
      |       '"batch_timestamp":"2026-01-01T00:00:00.000Z",' ||
      |       '"employee_range":"11-50","webhook_name":"wh-0",' ||
      |       '"source":"hq-data-warehouse"}}' AS payload
      |FROM customer WHERE c_mktsegment = 'BUILDING'
      |ORDER BY c_custkey LIMIT 5""".stripMargin

  /** X5+X6+X7 — scalar string/parse functions (page.tsx:341, send/route.ts
    * :155, companies/route.ts:8-9): 1-based substring truncation, concat,
    * try_cast-with-default.
    */
  def stringFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .orderBy("p_partkey").limit(50)
      .select(
        col("p_partkey"),
        substring(col("p_name"), 1, 12).as("short_name"),
        concat(col("p_brand"), lit(":"), col("p_type")).as("label"),
        coalesce(regexp_extract(col("p_brand"), "(\\d+)", 1).try_cast("long"), lit(100L))
          .as("brand_num"))
      .orderBy("p_partkey")

  private val stringFuncsSql =
    """SELECT p_partkey, substring(p_name, 1, 12) AS short_name,
      |       p_brand || ':' || p_type AS label,
      |       coalesce(TRY_CAST(regexp_extract(p_brand, '(\d+)', 1) AS BIGINT), 100) AS brand_num
      |FROM part ORDER BY p_partkey LIMIT 50""".stripMargin

  /** X10 — locale number formatting (page.tsx:378-384 `toLocaleString`):
    * thousands-grouped presentation of integer counts/keys. Spark
    * `format_number(n, 0)` vs DuckDB fmt-syntax `format('{:,}', n)` —
    * pure integer grouping with no rounding in play, so the rendered
    * strings agree exactly.
    */
  def numberFormat(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .orderBy("o_orderkey").limit(50)
      .select(
        col("o_orderkey"),
        format_number(col("o_orderkey") * lit(12345L), 0).as("key_fmt"),
        format_number(col("o_custkey"), 0).as("cust_fmt"))
      .orderBy("o_orderkey")

  private val numberFormatSql =
    """SELECT o_orderkey,
      |       format('{:,}', o_orderkey * 12345) AS key_fmt,
      |       format('{:,}', o_custkey) AS cust_fmt
      |FROM orders ORDER BY o_orderkey LIMIT 50""".stripMargin

  /** Grouped top-k — top-3 customers by total spend per market segment:
    * the per-group ranking scan (partitioned window over a pre-aggregated
    * frame — the aggregation shrinks the data BEFORE the window, so the
    * rank sorts groups' summaries, never raw facts). Exact decimal spend.
    */
  def segmentTopCustomers(spark: SparkSession, dir: String): DataFrame = {
    val spend = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment", "c_custkey")
      .agg(decSum(col("o_totalprice"), 18, 2).as("spend"))
    spend
      .withColumn("rank", row_number().over(
        Window.partitionBy("c_mktsegment")
          .orderBy(desc("spend"), col("c_custkey"))).cast("long"))
      .filter(col("rank") <= 3)
      .select("c_mktsegment", "rank", "c_custkey", "spend")
      .orderBy("c_mktsegment", "rank")
  }

  private val segmentTopCustomersSql =
    """WITH spend AS (
      |  SELECT c_mktsegment, c_custkey,
      |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY c_mktsegment, c_custkey)
      |SELECT c_mktsegment, CAST(rank AS BIGINT) AS rank, c_custkey, spend
      |FROM (SELECT *, row_number() OVER (PARTITION BY c_mktsegment
      |                                   ORDER BY spend DESC, c_custkey) AS rank
      |      FROM spend)
      |WHERE rank <= 3 ORDER BY c_mktsegment, rank""".stripMargin

  /** Time-based rolling aggregate — a RANGE window frame over event time
    * (per user: how many events in the trailing 30 minutes, including
    * this one). Frames are defined on epoch SECONDS (floored identically
    * by both engines), so sub-second timestamp noise can't shift frame
    * membership. Partitioned window: shuffles on user_id only.
    */
  def eventsRolling30m(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_sec"))
      .rangeBetween(-1800, 0)
    Tables.events(spark, dir)
      .withColumn("ts_sec", col("ts").cast("long"))
      .withColumn("n_last_30m", count(lit(1)).over(w))
      .select(col("event_id"), col("user_id"), col("n_last_30m"))
      .orderBy("event_id")
  }

  private val eventsRolling30mSql =
    """SELECT event_id, user_id,
      |       count(*) OVER (PARTITION BY user_id
      |                      ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
      |                      RANGE BETWEEN 1800 PRECEDING AND CURRENT ROW)
      |         AS n_last_30m
      |FROM events ORDER BY event_id""".stripMargin

  /** Window dedup — latest event per user (the keep-newest-version scan
    * every CDC/warehouse pipeline runs). Partitioned window: shuffles on
    * user_id only, no global ordering anywhere.
    */
  def latestEventPerUser(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(desc("ts"), desc("event_id"))
    Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id").as("last_event_id"),
        col("event_type").as("last_event_type"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("last_ts"))
      .orderBy("user_id")
  }

  private val latestEventPerUserSql =
    """SELECT user_id, event_id AS last_event_id,
      |       event_type AS last_event_type,
      |       strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_ts
      |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
      |                                   ORDER BY ts DESC, event_id DESC) AS rn
      |      FROM events)
      |WHERE rn = 1 ORDER BY user_id""".stripMargin

  /** TPC-H Q3 shape — top unshipped orders by revenue for one segment:
    * the classic 3-table star probe (filter both fact sides by date,
    * broadcast nothing — customer and orders shuffle on their join keys,
    * AQE picks the small side). Exact decimal revenue, key tiebreak.
    */
  def topUnshippedOrders(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = "1996-06-30"
    val c = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < lit(cutoff))
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") > lit(cutoff))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
      .agg(decSum(col("l_extendedprice") * (lit(1) - col("l_discount")), 20, 4)
        .as("revenue"))
      .orderBy(desc("revenue"), col("o_orderkey"))
      .limit(10)
      .select(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
        col("o_orderpriority"), col("revenue"))
  }

  private val topUnshippedOrdersSql =
    """SELECT o_orderkey,
      |       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
      |       o_orderpriority,
      |       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,4))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1996-06-30'
      |  AND l_shipdate > TIMESTAMP '1996-06-30'
      |GROUP BY o_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin

  /** Headline aggregate (TPC-H Q1 shape): pricing summary over lineitem.
    * Not a reference operator per se — the scan+group+multi-agg shape the
    * dashboard counts (A1/A2) take at warehouse scale; the bench workhorse.
    */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum("l_quantity").as("sum_qty"), // integral doubles: exact
        decSum(col("l_extendedprice"), 18, 2).as("sum_base"),
        decSum(col("l_extendedprice") * (lit(1) - col("l_discount")), 20, 4)
          .as("sum_disc_price"),
        (sum("l_quantity") / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  private val pricingSummarySql =
    """SELECT l_returnflag, l_linestatus,
      |       SUM(l_quantity) AS sum_qty,
      |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base,
      |       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,4))) AS DOUBLE) AS sum_disc_price,
      |       SUM(l_quantity) / count(*) AS avg_qty,
      |       count(*) AS count_order
      |FROM lineitem GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** The pricing aggregate routed through `Skew.saltedAgg`: phase 1
    * groups by (l_returnflag, salt) — a known-hot key (3 distinct values
    * over the whole fact table) spreads over 16 tasks each — phase 2
    * merges the partials by key. At 100 TB this is the shape that keeps
    * one straggler task from holding the shuffle hostage when partial
    * aggregation is defeated (collect_set-like states). The result is
    * algebraically ≡ the direct groupBy — count merges by sum, decimal
    * partial sums are exact under reassociation, and the quantity doubles
    * are integral (< 2^53, exact in any order) — so the skew machinery is
    * HASH-VERIFIED against the plain SQL GROUP BY, not just unit-tested.
    */
  def saltedGroupStats(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    graft.ops.Skew.saltedAgg(li, col("l_returnflag"), saltBuckets = 16,
        partials = Seq(
          count(lit(1)).as("pc"),
          sum(col("l_quantity")).as("pq"),
          sum(col("l_extendedprice").cast(DecimalType(18, 2))).as("pe")),
        merges = Seq(
          sum(col("pc")).as("n_rows"),
          sum(col("pq")).as("sum_qty"),
          sum(col("pe")).cast("double").as("sum_base")))
      .select(col("_key").as("l_returnflag"),
        col("n_rows"), col("sum_qty"), col("sum_base"))
      .orderBy("l_returnflag")
  }

  private val saltedGroupStatsSql =
    """SELECT l_returnflag, count(*) AS n_rows,
      |       SUM(l_quantity) AS sum_qty,
      |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Headline join (TPC-H Q3 shape): top-10 orders by revenue for one
    * segment — customer⋈orders⋈lineitem with O4 head limit.
    *
    * Shaped so LINEITEM is the stream side: the filter joins
    * (orders⋈customer-segment) reduce first, then the fact table joins
    * against that result. The previous `c.join(o).join(li)` order let the
    * static planner pick BuildRight = lineitem — broadcasting the FACT
    * table (the one plan that cannot survive any scale-up, and 1.3 s of
    * the local bench). No join hints: AQE picks broadcast vs shuffle from
    * runtime sizes, which is the decision that stays correct at 100 TB
    * where neither side of the filter join is broadcastable either.
    */
  def revenueTopk(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "AUTOMOBILE").select("c_custkey")
    val o = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
    val li = Tables.lineitem(spark, dir)
    val co = o.join(c, o("o_custkey") === c("c_custkey")).select("o_orderkey")
    li.join(co, li("l_orderkey") === co("o_orderkey"))
      .groupBy(col("o_orderkey"))
      .agg(decSum(col("l_extendedprice") * (lit(1) - col("l_discount")), 20, 4)
        .as("revenue"))
      .orderBy(desc("revenue"), col("o_orderkey"))
      .limit(10)
  }

  private val revenueTopkSql =
    """SELECT o_orderkey,
      |       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,4))) AS DOUBLE) AS revenue
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE c_mktsegment = 'AUTOMOBILE'
      |GROUP BY o_orderkey ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin

  /** §2.8 batch-equivalent of the streaming ingest: per-minute × type
    * event counts (the windowed aggregation the streaming wrapper runs;
    * timestamps emitted as strings — see class doc).
    */
  def eventsMinuteWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(
        date_format(date_trunc("minute", col("ts")), "yyyy-MM-dd HH:mm").as("minute"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        decSum(col("value"), 18, 6).as("sum_value"))
      .orderBy("minute", "event_type")

  private val eventsMinuteWindowSql =
    """SELECT strftime(date_trunc('minute', ts), '%Y-%m-%d %H:%M') AS minute,
      |       event_type, count(*) AS n,
      |       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Headline multi-join (TPC-H Q5 shape): revenue by nation within one
    * region — the full star-schema path region→nation→(customer, supplier)
    * →orders→lineitem. The two small dims broadcast; the fact joins
    * shuffle on their keys once each.
    */
  def regionRevenue(spark: SparkSession, dir: String): DataFrame = {
    val r = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
    val n = Tables.nation(spark, dir)
    val c = Tables.customer(spark, dir).select("c_custkey")
    val o = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
    val li = Tables.lineitem(spark, dir)
    val s = Tables.supplier(spark, dir)
    // LINEITEM is the stream side (see revenueTopk), and the SELECTIVE
    // join comes first: the region filter lives on the supplier branch,
    // so li⋈sn shrinks the fact stream ~|regions|× before the orderkey
    // join. The r3 regression: the static planner BROADCAST LINEITEM
    // (its 4-column pruned-size estimate at small SF is under 10 MB,
    // while the join branches' product-of-bytes estimates can never
    // look smaller). Both branches have provable output bounds —
    // |co| ≤ |orders| (c_custkey unique), |sn| ≤ |supplier| — so
    // broadcastIfBounded hints them from real scan stats when the
    // bound fits, and at cluster scale leaves the shuffle join + AQE's
    // runtime size call (verified: AQE demotes the co SMJ to broadcast
    // with a local shuffle read at sf0.1 when unhinted).
    // Region/nation broadcast by hint (bounded dims).
    val co = Relational.broadcastIfBounded(
      o.join(c, o("o_custkey") === c("c_custkey")).select("o_orderkey"), o)
    val sn = Relational.broadcastIfBounded(
      s.join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .select("s_suppkey", "n_name"), s)
    li.join(sn, li("l_suppkey") === sn("s_suppkey"))
      .join(co, li("l_orderkey") === co("o_orderkey"))
      .groupBy(col("n_name"))
      .agg(decSum(col("l_extendedprice") * (lit(1) - col("l_discount")), 20, 4)
        .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("n_name")
  }

  private val regionRevenueSql =
    """SELECT n_name,
      |       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,4))) AS DOUBLE) AS revenue,
      |       count(*) AS n_items
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** Window aggregation: per-customer running order spend and order index
    * (the generic warehouse analytic the dashboard's per-segment counters
    * grow into). Partitioned window — shuffles once on the customer key,
    * no global bottleneck.
    */
  def customerRunningSpend(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).filter(col("o_custkey") < 100)
    val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    o.select(
      col("o_custkey"), col("o_orderkey"),
      row_number().over(w).cast("long").as("order_idx"),
      sum(col("o_totalprice").cast(DecimalType(18, 2))).over(w)
        .cast("double").as("running_spend"))
      .orderBy("o_custkey", "o_orderkey")
  }

  private val customerRunningSpendSql =
    """SELECT o_custkey, o_orderkey,
      |       CAST(row_number() OVER w AS BIGINT) AS order_idx,
      |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS running_spend
      |FROM orders WHERE o_custkey < 100
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** Gap-based sessionization over the events stream (30-minute
    * inactivity gap): lag → gap flag → running session index, then
    * per-user session stats. The batch form of the sessionizer a
    * streaming pipeline runs with state; one shuffle on user_id.
    */
  def eventSessions(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val gapMicros = 1800L * 1000000L // exact integer micros on both engines
    val sessions = e
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > gapMicros, 1L)
          .otherwise(0L))
      .withColumn("session_idx",
        sum(col("new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    sessions
      .groupBy("user_id", "session_idx")
      .agg(count(lit(1)).as("n_events"),
        decSum(col("value"), 18, 6).as("sum_value"))
      .groupBy("user_id")
      .agg(max(col("session_idx")).as("n_sessions"),
        max(col("n_events")).as("max_session_events"),
        decSum(col("sum_value"), 20, 6).as("total_value"))
      .orderBy("user_id")
  }

  private val eventSessionsSql =
    """WITH marked AS (
      |  SELECT user_id, ts, event_id, value,
      |         CASE WHEN lag(ts) OVER w IS NULL
      |              OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
      |              THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sess AS (
      |  SELECT user_id, value,
      |         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
      |  FROM marked),
      |per_session AS (
      |  SELECT user_id, session_idx, count(*) AS n_events,
      |         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      |  FROM sess GROUP BY user_id, session_idx)
      |SELECT user_id, CAST(max(session_idx) AS BIGINT) AS n_sessions,
      |       max(n_events) AS max_session_events,
      |       CAST(SUM(CAST(sum_value AS DECIMAL(20,6))) AS DOUBLE) AS total_value
      |FROM per_session GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Exact percentiles per group (type-7 linear interpolation — the same
    * definition in Spark's `percentile` and DuckDB's `quantile_cont`, so
    * the interpolated doubles match bit-for-bit).
    */
  def orderValueQuantiles(spark: SparkSession, dir: String): DataFrame = {
    // distributed sort + rank selection (ops.Quantiles), NOT the
    // buffering percentile() aggregate: same type-7 math bit-for-bit
    // (QuantilesSpec asserts exact equality, the oracle hash agrees),
    // but memory per task is O(partition), not O(group)
    val orders = Tables.orders(spark, dir)
    val q = graft.ops.Quantiles.exactQuantiles(orders, "o_orderstatus",
      "o_totalprice", Seq("p50" -> 0.5, "p90" -> 0.9))
    val wide = q.groupBy("o_orderstatus")
      .agg(min(when(col("qname") === "p50", col("value"))).as("p50"),
        min(when(col("qname") === "p90", col("value"))).as("p90"))
    val mm = orders.groupBy("o_orderstatus")
      .agg(min("o_totalprice").as("min_price"),
        max("o_totalprice").as("max_price"))
    wide.join(mm, Seq("o_orderstatus")).orderBy("o_orderstatus")
  }

  private val orderValueQuantilesSql =
    """SELECT o_orderstatus,
      |       quantile_cont(o_totalprice, 0.5) AS p50,
      |       quantile_cont(o_totalprice, 0.9) AS p90,
      |       min(o_totalprice) AS min_price,
      |       max(o_totalprice) AS max_price
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** ROLLUP over segment × nation: subtotal and grand-total rows with the
    * standard NULL group markers, identical in both engines.
    */
  def segmentNationRollup(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .rollup("c_mktsegment", "c_nationkey")
      .agg(count(lit(1)).as("n"),
        decSum(col("c_acctbal"), 18, 2).as("sum_bal"))
      .orderBy(col("c_mktsegment").asc_nulls_first,
        col("c_nationkey").asc_nulls_first)

  private val segmentNationRollupSql =
    """SELECT c_mktsegment, c_nationkey, count(*) AS n,
      |       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
      |FROM customer GROUP BY ROLLUP (c_mktsegment, c_nationkey)
      |ORDER BY c_mktsegment ASC NULLS FIRST, c_nationkey ASC NULLS FIRST""".stripMargin

  /** CUBE over status × priority: all grouping-set combinations. */
  def orderStatusCube(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"),
        decSum(col("o_totalprice"), 18, 2).as("sum_price"))
      .orderBy(col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  private val orderStatusCubeSql =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  /** Pivot: event counts per user bucket × event type as columns (the
    * oracle mirrors it with FILTER aggregates — same result, portable).
    */
  def eventsPivot(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy((col("user_id") % 10).cast("long").as("user_bucket"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy("user_bucket")

  private val eventsPivotSql =
    """SELECT CAST(user_id % 10 AS BIGINT) AS user_bucket,
      |       count(*) FILTER (WHERE event_type = 'click') AS click,
      |       count(*) FILTER (WHERE event_type = 'error') AS error,
      |       count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
      |       count(*) FILTER (WHERE event_type = 'signup') AS signup,
      |       count(*) FILTER (WHERE event_type = 'view') AS view
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  /** As-of join: each event carries its user's most recent order at event
    * time (backward, '<='). Right side deduped to one row per (customer,
    * date) — highest order key wins — so the match is unique and both
    * engines agree. Oracle uses DuckDB's native ASOF JOIN; per-user event
    * counts keep the output compact.
    */
  def eventsLastOrder(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val r = Tables.orders(spark, dir)
      .groupBy(col("o_custkey").as("user_id"), col("o_orderdate"))
      .agg(max("o_orderkey").as("last_orderkey"),
        max("o_totalprice").as("last_price"))
    val joined = graft.ops.AsOf.joinBackward(
      e.select("event_id", "user_id", "ts"), r,
      key = "user_id", leftTime = "ts", rightTime = "o_orderdate",
      rightVals = Seq("last_orderkey", "last_price"),
      rightTiebreak = Some("last_orderkey"))
    joined.groupBy(col("user_id"), col("asof_last_orderkey").as("last_orderkey"),
        col("asof_last_price").as("last_price"))
      .agg(count(lit(1)).as("n_events"))
      .orderBy("user_id")
  }

  private val eventsLastOrderSql =
    """WITH r AS (
      |  SELECT o_custkey AS user_id, o_orderdate,
      |         max(o_orderkey) AS last_orderkey,
      |         max(o_totalprice) AS last_price
      |  FROM orders GROUP BY 1, 2),
      |j AS (
      |  SELECT e.user_id, r.last_orderkey, r.last_price
      |  FROM events e ASOF LEFT JOIN r
      |    ON e.user_id = r.user_id AND e.ts >= r.o_orderdate)
      |SELECT user_id, last_orderkey, last_price, count(*) AS n_events
      |FROM j GROUP BY 1, 2, 3 ORDER BY user_id""".stripMargin

  /** Interval self-join: per-user pairs of events within 60 s of each
    * other, summarized per user (burst detection — the range-join shape).
    * Bucketed equi-join, not a theta join; oracle is the plain inequality
    * join (fine at fixture scale).
    */
  def eventBursts(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("tm"), col("event_id"))
    val pairs = graft.ops.RangeJoin.withinTolerance(
      e, e, key = "user_id", lTimeMicros = "tm", rTimeMicros = "tm",
      lId = "event_id", rId = "event_id", tolMicros = 60L * 1000000L)
    pairs.groupBy("user_id")
      .agg(count(lit(1)).as("n_pairs"),
        min(abs(col("delta_micros"))).as("min_gap_micros"))
      .orderBy("user_id")
  }

  private val eventBurstsSql =
    """WITH e AS (SELECT user_id, epoch_us(ts) AS tm, event_id FROM events)
      |SELECT l.user_id, count(*) AS n_pairs,
      |       CAST(min(abs(r.tm - l.tm)) AS BIGINT) AS min_gap_micros
      |FROM e l JOIN e r
      |  ON l.user_id = r.user_id AND l.event_id < r.event_id
      | AND abs(l.tm - r.tm) <= 60000000
      |GROUP BY l.user_id ORDER BY l.user_id""".stripMargin

  /** Gap-based sessionization — the canonical large-scale event
    * pipeline op: events partition by user, sessions break on a >10 min
    * silence, and per-user session statistics aggregate out. Plan
    * shape at 100 TB: ONE hash shuffle on user_id, then both window
    * passes (the lag that marks session starts and the running sum
    * that numbers them) ride the SAME sort order — Catalyst plans a
    * single Sort + two Window operators with no intermediate exchange —
    * and the session grouping is a partial-aggregated groupBy on the
    * already-clustered keys. Ordering ties break on event_id so both
    * engines number identically.
    */
  def eventsSessionize(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gap = 600000000L // 10 min in micros
    val e = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tm"))
    val byUser = Window.partitionBy("user_id").orderBy("tm", "event_id")
    val marked = e.withColumn("new_s",
      when(col("tm") - lag(col("tm"), 1).over(byUser) > gap ||
        lag(col("tm"), 1).over(byUser).isNull, 1L).otherwise(0L))
    val sessions = marked.withColumn("sid",
      sum(col("new_s")).over(byUser.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)))
      .groupBy(col("user_id"), col("sid"))
      .agg(count(lit(1)).as("n_ev"),
        (max(col("tm")) - min(col("tm"))).as("span"))
    sessions.groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"),
        max(col("n_ev")).as("max_session_events"),
        max(col("span")).as("max_session_span_micros"))
      .orderBy("user_id")
  }

  private val eventsSessionizeSql =
    """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tm FROM events),
      |m AS (SELECT *,
      |  CASE WHEN lag(tm) OVER w IS NULL
      |         OR tm - lag(tm) OVER w > 600000000 THEN 1 ELSE 0 END AS new_s
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tm, event_id)),
      |s AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id
      |        ORDER BY tm, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM m),
      |g AS (SELECT user_id, sid, count(*) AS n_ev,
      |        max(tm) - min(tm) AS span FROM s GROUP BY 1, 2)
      |SELECT user_id, count(*) AS n_sessions,
      |       CAST(max(n_ev) AS BIGINT) AS max_session_events,
      |       CAST(max(span) AS BIGINT) AS max_session_span_micros
      |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Sequential conversion funnel: users whose first `view` is
    * followed by a later `click`, followed by a later `purchase` —
    * ORDER matters, so each stage's cutoff depends on the previous
    * stage's timestamp. Expressed JOIN-FREE as three LAYERED window
    * aggregates over the same `partition by user_id` (t1 = first view;
    * t2 = first click after t1; t3 = first purchase after t2 — a null
    * propagates forward, pruning the user from later stages), so the
    * whole funnel is ONE corpus scan and ONE hash exchange: the three
    * Window operators and the per-user fold all ride the same
    * clustering (the naive per-stage groupBy+join formulation scans
    * the corpus once per stage — measured 5 runtime scans before this
    * shape). Unbounded frames, no sort needed.
    */
  def eventsFunnel(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id")
    val e = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("tm"))
    val staged = e
      .withColumn("t1",
        min(when(col("event_type") === "view", col("tm"))).over(byUser))
      .withColumn("t2",
        min(when(col("event_type") === "click" && col("tm") > col("t1"),
          col("tm"))).over(byUser))
      .withColumn("t3",
        min(when(col("event_type") === "purchase" && col("tm") > col("t2"),
          col("tm"))).over(byUser))
    staged.groupBy("user_id") // t1..t3 are per-user constants: fold to one row
      .agg(max(col("t1")).as("t1"), max(col("t2")).as("t2"),
        max(col("t3")).as("t3"))
      .agg(count(col("t1")).as("n_view"),
        count(col("t2")).as("n_click_after_view"),
        count(col("t3")).as("n_purchase_after_click"))
  }

  private val eventsFunnelSql =
    """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS tm FROM events),
      |v AS (SELECT user_id, min(tm) AS t1 FROM e
      |      WHERE event_type = 'view' GROUP BY 1),
      |c AS (SELECT e.user_id, min(tm) AS t2 FROM e JOIN v USING (user_id)
      |      WHERE event_type = 'click' AND tm > t1 GROUP BY 1),
      |p AS (SELECT e.user_id, min(tm) AS t3 FROM e JOIN c USING (user_id)
      |      WHERE event_type = 'purchase' AND tm > t2 GROUP BY 1)
      |SELECT (SELECT count(*) FROM v) AS n_view,
      |       (SELECT count(*) FROM c) AS n_click_after_view,
      |       (SELECT count(*) FROM p) AS n_purchase_after_click""".stripMargin

  // ---------------------------------------------------------------------
  // Registry
  // ---------------------------------------------------------------------

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "available_by_range" -> availableByRange _,
    "paged_listing" -> pagedListing _,
    "fuzzy_bucket_counts" -> fuzzyBucketCounts _,
    "sent_vs_total" -> sentVsTotal _,
    "scan_stats" -> scanStats _,
    "ordered_dim_scan" -> orderedDimScan _,
    "filter_ilike" -> filterIlike _,
    "fetch_by_ids" -> fetchByIds _,
    "fk_lookup_join" -> fkLookupJoin _,
    "range_capacity" -> rangeCapacity _,
    "distribution_assign" -> distributionAssign _,
    "distribution_unassigned" -> distributionUnassigned _,
    "send_summary" -> sendSummary _,
    "ingest_normalize" -> ingestNormalize _,
    "ingest_audit" -> ingestAudit _,
    "batch_metadata_json" -> batchMetadataJson _,
    "string_funcs" -> stringFuncs _,
    "number_format" -> numberFormat _,
    "pricing_summary" -> pricingSummary _,
    "salted_group_stats" -> saltedGroupStats _,
    "revenue_topk" -> revenueTopk _,
    "events_minute_window" -> eventsMinuteWindow _,
    "region_revenue" -> regionRevenue _,
    "customer_running_spend" -> customerRunningSpend _,
    "event_sessions" -> eventSessions _,
    "order_value_quantiles" -> orderValueQuantiles _,
    "segment_nation_rollup" -> segmentNationRollup _,
    "events_pivot" -> eventsPivot _,
    "order_status_cube" -> orderStatusCube _,
    "events_last_order" -> eventsLastOrder _,
    "event_bursts" -> eventBursts _,
    "events_sessionize" -> eventsSessionize _,
    "events_funnel" -> eventsFunnel _,
    "latest_event_per_user" -> latestEventPerUser _,
    "top_unshipped_orders" -> topUnshippedOrders _,
    "events_rolling_30m" -> eventsRolling30m _,
    "segment_top_customers" -> segmentTopCustomers _
  )

  val oracles: Map[String, String] = Map(
    "available_by_range" -> availableByRangeSql,
    "paged_listing" -> pagedListingSql,
    "fuzzy_bucket_counts" -> fuzzyBucketCountsSql,
    "sent_vs_total" -> sentVsTotalSql,
    "scan_stats" -> scanStatsSql,
    "ordered_dim_scan" -> orderedDimScanSql,
    "filter_ilike" -> filterIlikeSql,
    "fetch_by_ids" -> fetchByIdsSql,
    "fk_lookup_join" -> fkLookupJoinSql,
    "range_capacity" -> rangeCapacitySql,
    "distribution_assign" -> distributionAssignSql,
    "distribution_unassigned" -> distributionUnassignedSql,
    "send_summary" -> sendSummarySql,
    "ingest_normalize" -> ingestNormalizeSql,
    "ingest_audit" -> ingestAuditSql,
    "batch_metadata_json" -> batchMetadataJsonSql,
    "string_funcs" -> stringFuncsSql,
    "number_format" -> numberFormatSql,
    "pricing_summary" -> pricingSummarySql,
    "salted_group_stats" -> saltedGroupStatsSql,
    "revenue_topk" -> revenueTopkSql,
    "events_minute_window" -> eventsMinuteWindowSql,
    "region_revenue" -> regionRevenueSql,
    "customer_running_spend" -> customerRunningSpendSql,
    "event_sessions" -> eventSessionsSql,
    "order_value_quantiles" -> orderValueQuantilesSql,
    "segment_nation_rollup" -> segmentNationRollupSql,
    "events_pivot" -> eventsPivotSql,
    "order_status_cube" -> orderStatusCubeSql,
    "events_last_order" -> eventsLastOrderSql,
    "event_bursts" -> eventBurstsSql,
    "events_sessionize" -> eventsSessionizeSql,
    "events_funnel" -> eventsFunnelSql,
    "latest_event_per_user" -> latestEventPerUserSql,
    "top_unshipped_orders" -> topUnshippedOrdersSql,
    "events_rolling_30m" -> eventsRolling30mSql,
    "segment_top_customers" -> segmentTopCustomersSql
  )
}
