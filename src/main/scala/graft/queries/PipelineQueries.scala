package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Training-data pipeline operators (dedup, similarity search, multimodal,
  * text analysis) over the `documents`/`embeddings` tables — filled in by
  * graft.pipeline. */
object PipelineQueries {
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  def oracleSql: Map[String, String] = Map()
}
