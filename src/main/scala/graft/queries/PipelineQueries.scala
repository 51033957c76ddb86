package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.bpeishTokenCount
import graft.operators.Packing

/** Corpus-layout operators (sharding + sequence packing) over the
  * documents table — the last mile of a training-data pipeline.
  * Shard ids use portable md5 arithmetic (Spark `conv` = DuckDB
  * `CAST('0x'||hex)`), so layout decisions replay bit-identically in
  * the oracle.
  */
object PipelineQueries {

  private val SHARDS = 8
  private val BUDGET = 2048L

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // deterministic sharding: uniform md5 buckets, per-shard stats
    "q_shard" -> ((s, dir) =>
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          Packing.shardId("doc_id", SHARDS).as("shard"),
          bpeishTokenCount(col("text")).cast("long").as("n_tok"))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("sum_tok"))),

    // deterministic hash sample: stable holdout selection, exact oracle
    "q_sample" -> ((s, dir) =>
      graft.operators.Sampling.hashSample(
          Tables(s, dir, "documents"), "doc_id", keep = 3, outOf = 16)
        .select(col("doc_id"), col("lang"), col("n_chars"))),

    // offset-binned packing: window-function form with an exact oracle
    "q_pack" -> ((s, dir) =>
      Packing.offsetBinned(
          Tables(s, dir, "documents")
            .select(col("doc_id"),
              bpeishTokenCount(col("text")).cast("long").as("n_tok")),
          "doc_id", "n_tok", SHARDS, BUDGET)
        .select(col("doc_id"), col("shard"), col("cum_before"), col("pack_id")))
  )

  private val SHARD_SQL =
    s"CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 6) AS BIGINT) % $SHARDS"
  private val TOK_SQL =
    """CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS BIGINT)"""

  val oracles: Map[String, String] = Map(
    "q_shard" ->
      s"""WITH d AS (SELECT doc_id, $SHARD_SQL AS shard, $TOK_SQL AS n_tok
         |           FROM documents)
         |SELECT shard, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS sum_tok
         |FROM d GROUP BY shard""".stripMargin,
    "q_sample" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 6) AS BIGINT)
        |      % 16 < 3""".stripMargin,
    "q_pack" ->
      s"""WITH d AS (SELECT doc_id, $SHARD_SQL AS shard, $TOK_SQL AS n_tok
         |           FROM documents)
         |SELECT doc_id, shard,
         |  CAST(coalesce(sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id ASC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |    AS cum_before,
         |  CAST(floor(coalesce(sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id ASC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / $BUDGET) AS BIGINT)
         |    AS pack_id
         |FROM d""".stripMargin
  )
}
