package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Multimodal plumbing exercised end to end: documents' text bytes
  * stand in for opaque media payloads; metadata (size, content hash)
  * and the clearly-marked decode STUB flow through the engine as
  * binary + struct columns.
  */
object MultimodalQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_meta" -> ((s, dir) => {
      val withBin = Tables(s, dir, "documents")
        .select(col("doc_id"), encode(col("text"), "utf-8").as("payload"))
      Multimodal.decodeStub(Multimodal.withMeta(withBin, "payload"), "payload")
        .select(col("doc_id"),
          col("meta.n_bytes").as("n_bytes"),
          col("meta.sha256").as("sha256"),
          col("decoded.width").as("width"),
          col("decoded.height").as("height"),
          col("decoded.channels").as("channels"))
    })
  )

  val oracles: Map[String, String] = Map(
    "mm_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  sha256(text) AS sha256,
        |  CAST(1 + octet_length(encode(text)) % 64 AS BIGINT) AS width,
        |  CAST(1 + (octet_length(encode(text)) * 7) % 64 AS BIGINT) AS height,
        |  CAST(3 AS BIGINT) AS channels
        |FROM documents""".stripMargin
  )
}
