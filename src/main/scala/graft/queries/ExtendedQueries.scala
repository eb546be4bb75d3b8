package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** North-star LLM-data-pipeline operators over the `documents` and
  * `embeddings` fixtures (dedup, similarity search, text analysis,
  * multimodal). Populated in the extended-ops phase.
  */
object ExtendedQueries {
  val all: Map[String, (SparkSession, String) => DataFrame] = Map()
  val oracles: Map[String, String] = Map()
}
