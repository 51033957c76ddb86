package graft

import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.functions._
import graft.sources.WarcSource

/** WARC container round-trip and framing microscope: the gate's
  * warc_source exercises writer+reader over the corpus pages; this
  * spec pins the record framing (warcinfo preamble, exact
  * Content-Length), the non-response skip, foreign-record parsing
  * (status/mime the writer never emits), and payload fidelity.
  */
class WarcSourceSpec extends SparkSpec {

  import spark.implicits._

  private def tmpDir(name: String): String =
    Files.createTempDirectory(name).toString

  /** Visible part files only (no hidden .crc checksums). */
  private def partFiles(dir: String): Seq[String] =
    Files.list(Paths.get(dir)).toArray.map(_.toString)
      .filter { p =>
        val n = Paths.get(p).getFileName.toString
        n.startsWith("part-") && !n.endsWith(".crc")
      }.toSeq

  private val rows = Seq(
    ("https://a.com/doc/1", "<html><body><p>plain prose</p></body></html>"),
    ("https://b.co.uk/x", "<html><p>two\nlines &amp; an entity</p></html>"),
    ("https://c.net/", "<html></html>"))

  test("round-trip preserves url, status, mime, and exact payload") {
    val dir = tmpDir("warc_rt")
    WarcSource.toWarc(rows.toDF("uri", "html").repartition(2),
      "uri", "html", dir)
    val back = WarcSource.fromWarc(spark, dir)
      .select("url", "http_status", "mime", "html")
      .as[(String, Int, String, String)].collect().sortBy(_._1)
    assert(back.toSeq === rows.sortBy(_._1)
      .map { case (u, h) => (u, 200, "text/html", h) })
  }

  test("each partition file opens with a warcinfo record; reader skips it") {
    val dir = tmpDir("warc_info")
    WarcSource.toWarc(rows.toDF("uri", "html").repartition(2),
      "uri", "html", dir)
    val parts = partFiles(dir)
    assert(parts.nonEmpty)
    parts.foreach { p =>
      val txt = new String(Files.readAllBytes(Paths.get(p)),
        StandardCharsets.UTF_8)
      assert(txt.startsWith("WARC/1.0\r\nWARC-Type: warcinfo\r\n"))
    }
    assert(WarcSource.fromWarc(spark, dir).count() === rows.size)
  }

  test("writer's WARC Content-Length matches the HTTP block exactly") {
    val dir = tmpDir("warc_len")
    WarcSource.toWarc(Seq(rows.head).toDF("uri", "html").coalesce(1),
      "uri", "html", dir)
    val part = partFiles(dir).head
    val txt = new String(Files.readAllBytes(Paths.get(part)),
      StandardCharsets.UTF_8)
    val rec = txt.split("WARC/1\\.0\r\n").find(_.startsWith("WARC-Type: response")).get
    val declared = "(?m)^Content-Length: ([0-9]+)".r
      .findFirstMatchIn(rec).get.group(1).toInt
    val httpBlock = rec.substring(rec.indexOf("\r\n\r\n") + 4)
      .stripSuffix("\n").stripSuffix("\r\n\r\n")
    assert(httpBlock.length === declared)
  }

  test("payload with its own CRLF blank lines comes back intact") {
    val dir = tmpDir("warc_blank")
    val body = "<pre>first\r\n\r\nsecond\r\n\r\nthird</pre>"
    WarcSource.toWarc(Seq(("https://a.com/b", body)).toDF("uri", "html")
      .coalesce(1), "uri", "html", dir)
    val got = WarcSource.fromWarc(spark, dir)
      .select("html").as[String].head()
    assert(got === body)
  }

  test("Content-Length is octets, not chars (non-ASCII payload)") {
    val dir = tmpDir("warc_octet")
    val body = "<p>café — résumé</p>"
    WarcSource.toWarc(Seq(("https://a.com/u", body)).toDF("uri", "html")
      .coalesce(1), "uri", "html", dir)
    val part = partFiles(dir).head
    val txt = new String(Files.readAllBytes(Paths.get(part)),
      StandardCharsets.UTF_8)
    val rec = txt.split("WARC/1\\.0\r\n")
      .find(_.startsWith("WARC-Type: response")).get
    val declared = "(?m)^Content-Length: ([0-9]+)".r
      .findFirstMatchIn(rec).get.group(1).toInt
    val httpBlock = rec.substring(rec.indexOf("\r\n\r\n") + 4)
      .stripSuffix("\n").stripSuffix("\r\n\r\n")
    assert(httpBlock.getBytes(StandardCharsets.UTF_8).length === declared)
    assert(httpBlock.length < declared) // chars < octets here
  }

  test("foreign records parse: 404 status and non-html mime") {
    val dir = tmpDir("warc_foreign")
    val rec = "WARC/1.0\r\n" +
      "WARC-Type: warcinfo\r\nWARC-Record-ID: <urn:x:i>\r\n" +
      "Content-Type: application/warc-fields\r\n\r\nsoftware: other\r\n\r\n" +
      "WARC/1.0\r\n" +
      "WARC-Type: response\r\nWARC-Target-URI: https://gone.org/p\r\n" +
      "Content-Type: application/http;msgtype=response\r\n\r\n" +
      "HTTP/1.0 404 Not Found\r\nContent-Type: text/plain\r\n\r\n" +
      "not here\r\n\r\n"
    Files.write(Paths.get(dir, "f.warc"), rec.getBytes(StandardCharsets.UTF_8))
    val got = WarcSource.fromWarc(spark, dir)
      .select("url", "http_status", "mime", "html")
      .as[(String, Int, String, String)].collect()
    assert(got.toSeq === Seq(("https://gone.org/p", 404, "text/plain",
      "not here")))
  }
}
