package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see SURVEY.md §7 and README. Every operator from
  * the SURVEY §2 inventory (plus the LLM-pipeline extensions) is
  * declared as a named query with, where SQL-expressible, a DuckDB
  * oracle over the same parquet tables. Column names are aligned
  * between the Spark result and the oracle (the driver's compare
  * sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship: two-level nest → flatten round-trip on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    FlattenQueries.queries("flatten_nested2")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    FlattenQueries.queries ++
      RelationalQueries.queries ++
      EventQueries.queries ++
      TextQueries.queries ++
      DedupQueries.queries ++
      VectorQueries.queries ++
      MultimodalQueries.queries ++
      PipelineQueries.queries ++
      StreamQueries.queries ++
      CrawlQueries.queries

  def oracleSql: Map[String, String] =
    FlattenQueries.oracles ++
      RelationalQueries.oracles ++
      EventQueries.oracles ++
      TextQueries.oracles ++
      DedupQueries.oracles ++
      VectorQueries.oracles ++
      MultimodalQueries.oracles ++
      PipelineQueries.oracles ++
      StreamQueries.oracles ++
      CrawlQueries.oracles
}
