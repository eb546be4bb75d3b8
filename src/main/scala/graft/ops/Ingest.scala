package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.model.Dims

/** The ingest path of the reference's Clay webhook
  * (supabase/functions/clay-webhook/index.ts:28-147) as pure,
  * batch-first transforms: normalize → whitelist-project → derive audit.
  * One input row = one HTTP request body; a micro-batch carries many
  * requests, and audit rows are derived PER REQUEST, exactly one each —
  * success, empty, or parse-error — mirroring the reference's
  * one-request-one-log behavior. The streaming wrapper (graft.streaming)
  * runs these unchanged per micro-batch.
  */
object Ingest {

  /** Payload schema: a person record plus the `_batch_metadata` envelope
    * (clay-webhook/index.ts:8-26).
    */
  val personSchema: StructType = {
    val base = Dims.Schemas.clayFindPeople
    StructType(base.fields :+
      StructField("_batch_metadata", Dims.Schemas.batchMetadata))
  }

  /** D6 — array-or-scalar normalization (`Array.isArray(body) ? body :
    * [body]`, index.ts:50): parse the raw JSON once with the array
    * schema; a scalar object parses to NULL under the array schema, in
    * which case re-parse as a single object and wrap. A body that parses
    * under neither schema is a malformed request (the reference's
    * catch-all, index.ts:131-140): kept as one row with a NULL record via
    * explode_outer so the audit sees it.
    *
    * Output: `_request` (the raw body), `record` (one exploded person
    * record, NULL for malformed requests).
    */
  def normalize(raw: DataFrame, jsonCol: String): DataFrame = {
    // from_json with a STRUCT schema yields an all-NULL row (not NULL) on
    // malformed input — a corrupt-record column is the documented way to
    // tell "parsed object with null fields" from "didn't parse at all"
    val corruptField = "_corrupt_record"
    val scalarSchema = StructType(personSchema.fields :+
      StructField(corruptField, StringType))
    val asArray = from_json(col(jsonCol), ArrayType(personSchema))
    val asScalar = from_json(col(jsonCol), scalarSchema,
      Map("columnNameOfCorruptRecord" -> corruptField))
    val scalarOk = asScalar.isNotNull && asScalar.getField(corruptField).isNull
    raw
      .withColumn("_records",
        when(asArray.isNotNull, asArray)
          .when(scalarOk, array(asScalar.dropFields(corruptField)))
          .otherwise(lit(null).cast(ArrayType(personSchema))))
      .select(col(jsonCol).as("_request"), explode_outer(col("_records")).as("record"))
  }

  /** P2 — whitelist projection with null-coalesce (index.ts:76-91): keep
    * exactly the 14 allowed person fields from each parsed record;
    * unknown fields (and the metadata envelope) are dropped by
    * construction, absent fields become NULL. Malformed-request marker
    * rows (NULL record) don't produce people.
    */
  def whitelistProject(records: DataFrame): DataFrame = {
    val cols: Seq[Column] =
      Dims.Schemas.clayFindPeopleColumns.map(f => col(s"record.$f").as(f))
    records.filter(col("record").isNotNull).select(cols: _*)
  }

  /** D7+D8 — one audit row per request (index.ts:58-140): batch id from
    * the first record's envelope (D7), received == inserted counts (the
    * reference inserts whatever parsed; per-write failures are handled by
    * the caller flipping status to 'error'), status/error mirroring the
    * reference's three paths: success, empty payload, invalid JSON.
    */
  def auditRows(records: DataFrame, sourceIp: String): DataFrame =
    records
      .groupBy(col("_request"))
      .agg(
        coalesce(first(col("record._batch_metadata.batch_id"), ignoreNulls = true),
          lit("unknown")).as("batch_id"),
        count(col("record")).cast("int").as("records_received"))
      .select(
        col("batch_id"),
        col("records_received"),
        col("records_received").as("records_inserted"),
        when(col("records_received") > 0, "success").otherwise("error").as("status"),
        when(col("records_received") > 0, lit(null).cast("string"))
          .otherwise(lit("Invalid or empty payload")).as("error_message"),
        lit(sourceIp).as("source_ip"))

  /** Full pipeline for a batch of request bodies:
    * (people rows, one audit row per request).
    */
  def processRequest(raw: DataFrame, jsonCol: String,
                     sourceIp: String): (DataFrame, DataFrame) = {
    val records = normalize(raw, jsonCol)
    (whitelistProject(records), auditRows(records, sourceIp))
  }
}
