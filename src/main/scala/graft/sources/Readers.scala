package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Schema-enforced readers for the engine's source formats. The driver
  * fixtures are parquet (`model.Tables`); these cover the other arrival
  * paths the reference implies — JSON request bodies (the webhook
  * ingest), delimited exports — with the same corrupt-row accounting the
  * ingest pipeline uses.
  *
  * Principles at scale: always pass an explicit schema (inference scans
  * the data twice and infers wrong on empty partitions); keep corrupt
  * rows visible (PERMISSIVE + corrupt column) instead of silently
  * dropping; project immediately so pruning reaches the scan.
  */
object Readers {

  val CorruptCol = "_corrupt_record"

  /** Line-delimited JSON with explicit schema; malformed lines land in
    * `_corrupt_record` instead of vanishing.
    */
  def jsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(StructType(schema.fields :+ StructField(CorruptCol, StringType)))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  /** Split a schema-enforced read into (valid rows, corrupt raw lines).
    *
    * Caches the parsed scan first: Spark refuses queries that prune a raw
    * JSON/CSV scan down to only the corrupt column
    * (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) — the
    * documented workaround is to materialize the parse once, which is
    * also what you want operationally (parse once, route twice).
    */
  def splitCorrupt(df: DataFrame): (DataFrame, DataFrame) = {
    val parsed = df.cache()
    (parsed.filter(col(CorruptCol).isNull).drop(CorruptCol),
      parsed.filter(col(CorruptCol).isNotNull).select(col(CorruptCol)))
  }

  /** CSV with explicit schema + header, same corrupt-row contract. */
  def csv(spark: SparkSession, path: String, schema: StructType,
          header: Boolean = true, delimiter: String = ","): DataFrame =
    spark.read
      .schema(StructType(schema.fields :+ StructField(CorruptCol, StringType)))
      .option("header", header.toString)
      .option("sep", delimiter)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .csv(path)

  /** Schema-evolved parquet read: batches written before a column was
    * added coexist with batches written after (the steady state of any
    * append path that ever ships a new field). `mergeSchema` unions the
    * per-file footers at planning time; rows from old files surface the
    * new columns as NULL — no rewrite of historical data. At 100 TB,
    * footer-merge cost scales with FILE count, not data size (and a table
    * format's catalog amortizes even that).
    */
  def parquetEvolved(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)
}
