package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (ISO 28500) ingestion — the container format every web-crawl
  * corpus (Common Crawl and friends) arrives in, and the input the
  * crawl stages ([[graft.operators.HtmlExtract]] → Gopher rules →
  * dedup → selection) start from. The reference library has no crawl
  * container; this closes the last ingestion gap of an LLM-pipeline
  * build: WARC response records in, (url, status, mime, html) out.
  *
  * Read strategy — Spark-first, splittable: the file is read with
  * Hadoop's delimited text reader using the record-start magic
  * `WARC/1.0\r\n` as the record separator, so a multi-gigabyte WARC
  * SPLITS across tasks like any text file (each task seeks to the
  * next magic, exactly how LineRecordReader handles custom
  * delimiters) and all header/payload parsing is narrow string
  * expressions riding the scan — zero shuffle, no driver pass.
  *
  * Framing contract (documented, not silent): delimiter framing
  * assumes the magic never occurs INSIDE a payload — true for the
  * uncompressed text fixtures here and for any payload-escaped
  * archive. Production Common Crawl WARCs are gzip-per-record, where
  * the correct split unit is the gzip member (the magic then cannot
  * occur mid-payload by construction); that decompress loop is the
  * same per-record parse this source implements, behind a codec this
  * container does not ship (the [[graft.operators.Multimodal]] stub
  * discipline).
  *
  * The writer emits spec-shaped records (version line, WARC headers,
  * HTTP response block, double-CRLF framing) with one `warcinfo`
  * record per partition file, mirroring how real crawlers open each
  * WARC file — the reader must skip non-response records to be
  * correct on its own output.
  */
object WarcSource {

  private val Magic = "WARC/1.0\r\n"

  /** Serialize (uri, html) rows as WARC files, one per partition,
    * each opened by a `warcinfo` record. */
  def toWarc(df: DataFrame, uriCol: String, htmlCol: String,
             path: String): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    val recs = df.select(
      concat(
        lit(Magic),
        lit("WARC-Type: response\r\nWARC-Target-URI: "), col(uriCol),
        lit("\r\nWARC-Record-ID: <urn:graft:"),
        md5(col(uriCol)), lit(">\r\n"),
        lit("Content-Type: application/http;msgtype=response\r\n"),
        lit("Content-Length: "),
        // exact HTTP-block length in OCTETS (WARC/HTTP Content-Length
        // is bytes, not chars — they differ on non-ASCII payloads):
        // status line (17) + Content-Type header (25) +
        // "Content-Length: " (16) + its digits + CRLF (2) + blank
        // line (2) + body bytes
        (octet_length(col(htmlCol)) +
          length(octet_length(col(htmlCol)).cast("string")) + lit(62))
          .cast("string"),
        lit("\r\n\r\n"),
        lit("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\nContent-Length: "),
        octet_length(col(htmlCol)).cast("string"),
        lit("\r\n\r\n"), col(htmlCol), lit("\r\n\r\n")).as("rec"))
      .as[String]
    val withInfo: Dataset[String] = recs.mapPartitions { it =>
      val info = Magic +
        "WARC-Type: warcinfo\r\nWARC-Record-ID: <urn:graft:warcinfo>\r\n" +
        "Content-Type: application/warc-fields\r\n\r\n" +
        "software: graft\r\n\r\n"
      Iterator(info) ++ it
    }
    withInfo.write.mode("overwrite").option("compression", "none")
      .text(path)
  }

  /** Read WARC files into (url, http_status, mime, html): response
    * records only, parsed with narrow expressions at scan speed. */
  def fromWarc(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.option("lineSep", Magic).text(path)
    // a row is everything between two magics: WARC headers, blank
    // line, HTTP block (status line + headers, blank line, body),
    // trailing record gap. The leading pre-magic fragment of each
    // file is empty and drops with the type filter.
    val parts = split(col("value"), "\r\n\r\n")
    raw
      .select(
        regexp_extract(col("value"), "(?m)^WARC-Type: ([^\r\n]+)", 1)
          .as("warc_type"),
        regexp_extract(col("value"), "(?m)^WARC-Target-URI: ([^\r\n]+)", 1)
          .as("url"),
        // get() not element_at(): the pre-magic fragment row has one
        // split part, and element_at throws out-of-bounds under ANSI
        regexp_extract(get(parts, lit(1)), "^HTTP/1\\.[01] ([0-9]{3})", 1)
          .as("status_s"),
        regexp_extract(get(parts, lit(1)), "(?m)^Content-Type: ([^\r\n]+)", 1)
          .as("mime"),
        // body = every part between the HTTP-header block and the
        // record-closing blank line, REJOINED — a payload containing
        // its own CRLF blank lines must come back intact, not
        // truncated at its first internal \r\n\r\n
        when(size(parts) >= 4,
          array_join(slice(parts, lit(3), size(parts) - lit(3)),
            "\r\n\r\n")).as("html"))
      .filter(col("warc_type") === "response")
      .select(col("url"), col("status_s").cast("int").as("http_status"),
        col("mime"), col("html"))
  }
}
