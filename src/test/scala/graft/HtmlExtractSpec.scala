package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.HtmlExtract

/** HTML main-content extraction: hand-built pages pin each rule of
  * the jusText-shaped block classifier — script/style/comment
  * removal, block segmentation, link-density, tag-density, stopword
  * and length rules, entity decoding, block order, and the
  * empty-page shape. (The gate exercises the same operator over the
  * synthesized corpus pages; this spec is the per-rule microscope.)
  */
class HtmlExtractSpec extends SparkSpec {

  import spark.implicits._

  private val page =
    "<html><head><title>My Site</title>" +
      "<style>body { color: red; }</style>" +
      "<script>var a = 1 < 2; track();</script>" +
      "<!-- hidden comment full of prose words the rules would keep -->" +
      "</head><body>" +
      "<nav><a href=\"/\">Home page</a> <a href=\"/b\">Blog index</a></nav>" +
      "<h1>A story about the sea</h1>" +
      "<p>The tide rises and the tide falls over the long brown sand " +
      "while gulls wheel in the wind.</p>" +
      "<p>Fish &amp; chips taste better in the cold evening air, " +
      "it is said, and nobody argues.</p>" +
      "<p><img src=\"a.png\"><img src=\"b.png\"><img src=\"c.png\"> " +
      "fig one two</p>" +
      "<ul><li><a href=\"/m\">Read more posts</a></li></ul>" +
      "<footer>Copyright 2026 <a href=\"/p\">Privacy</a> " +
      "<a href=\"/i\">Imprint</a></footer>" +
      "</body></html>"

  private def run(html: String): Row =
    HtmlExtract.extract(Seq((1L, html)).toDF("id", "html"), "html")
      .collect().head

  test("article paragraphs survive in order; chrome is dropped") {
    val out = run(page)
    val main = out.getAs[String]("main_text")
    assert(out.getAs[Long]("n_kept") == 3, out.toString)
    val lines = main.split("\n")
    // heading kept: 5 words with two stopwords ('a', 'the')
    assert(lines(0) == "A story about the sea")
    assert(lines(1).startsWith("The tide rises"))
    assert(lines(2).startsWith("Fish & chips"), "entity must decode")
    // nothing from nav/footer/list/script/style/comment leaks through
    for (bad <- Seq("Home", "Blog", "Privacy", "Imprint", "Read more",
        "color: red", "track()", "hidden comment", "fig one"))
      assert(!main.contains(bad), s"boilerplate leaked: $bad")
    assert(out.getAs[Long]("main_chars") == main.length.toLong)
  }

  test("per-rule classification reasons") {
    val reasons = HtmlExtract.profile(
        Seq((1L, page)).toDF("id", "html"), "html")
      .collect().map(r => r.getAs[String]("reason") ->
        r.getAs[Long]("n_blocks")).toMap
    // title remnant "My Site" (2 words) + the tag-only </body></html>
    // trailer (zero words) — tag remnants are blocks with no text,
    // bookkept under empty_or_short per the operator's contract
    assert(reasons("empty_or_short") == 2L, reasons.toString)
    // nav, related-links li, footer
    assert(reasons("link_heavy") == 3L, reasons.toString)
    // the image row: 3 tags over 3 words
    assert(reasons("tag_soup") == 1L, reasons.toString)
    assert(reasons("kept") == 3L, reasons.toString)
    assert(!reasons.contains("short_no_stop"), reasons.toString)
  }

  test("short heading without stopwords is dropped as short_no_stop") {
    val html = "<body><h1>Quarterly Revenue Report Draft</h1>" +
      "<p>The numbers in the report are all within the usual band " +
      "and nothing surprising appears anywhere this quarter.</p></body>"
    val out = run(html)
    assert(out.getAs[Long]("n_kept") == 1)
    assert(out.getAs[String]("main_text").startsWith("The numbers"))
    val reasons = HtmlExtract.profile(
        Seq((1L, html)).toDF("id", "html"), "html")
      .collect().map(r => r.getAs[String]("reason")).toSet
    assert(reasons.contains("short_no_stop"))
  }

  test("long block passes on length alone, no stopwords required") {
    val html = "<body><p>alpha beta gamma delta epsilon zeta eta theta " +
      "iota kappa lambda mu.</p></body>"
    assert(run(html).getAs[Long]("n_kept") == 1)
  }

  test("page with no prose extracts to null main_text, zero chars") {
    val html = "<body><nav><a href=\"/x\">One two three</a></nav>" +
      "<script>var x = 'lots of words in here do not count';</script></body>"
    val out = run(html)
    assert(out.getAs[Long]("n_kept") == 0)
    assert(out.getAs[String]("main_text") == null)
    assert(out.getAs[Long]("main_chars") == 0L)
  }

  test("self-closing and attribute-bearing block tags segment too") {
    val html = "<body><p class=\"x\" id=\"y\">The first piece of the story " +
      "carries on well past the needed ten words.</p><br/>" +
      "<div style=\"a\">And a second block of prose follows the break " +
      "with plenty of words of its own.</div></body>"
    val out = run(html)
    assert(out.getAs[Long]("n_kept") == 2)
    // 4 = the two prose blocks + the <body> and </body> tag remnants
    assert(out.getAs[Long]("n_blocks") == 4)
  }

  test("outlinks: document order, raw hrefs, stripped anchors, sections") {
    val got = HtmlExtract.outlinks(
        Seq((1L, page)).toDF("id", "html"), "html")
      .orderBy("rank")
      .collect().map(r => (r.getAs[Long]("rank"), r.getAs[String]("href"),
        r.getAs[String]("anchor"), r.getAs[String]("section")))
      .toSeq
    assert(got == Seq(
      (1L, "/", "Home page", ""),
      (2L, "/b", "Blog index", "b"),
      (3L, "/m", "Read more posts", "m"),
      (4L, "/p", "Privacy", "p"),
      (5L, "/i", "Imprint", "i")), got.toString)
  }

  test("outlinks: links inside script are not links; linkless page " +
    "emits no rows; inline tags inside anchors strip") {
    val html = "<body><script>var s = '<a href=\"/x\">fake</a>';</script>" +
      "<p><a href=\"/real\">A <b>bold</b> link &amp; more</a></p></body>"
    val got = HtmlExtract.outlinks(Seq((1L, html)).toDF("id", "html"), "html")
      .collect().map(r => (r.getAs[String]("href"), r.getAs[String]("anchor")))
      .toSeq
    assert(got == Seq(("/real", "A bold link & more")), got.toString)
    assert(HtmlExtract.outlinks(
      Seq((1L, "<body><p>No links at all here.</p></body>"))
        .toDF("id", "html"), "html").count() == 0)
  }

  test("entities decode with &amp; last (no double decode)") {
    // &amp;lt; must become the literal text "&lt;", not "<"
    val html = "<body><p>The code prints &amp;lt; to the page and " +
      "everyone is happy about it always.</p></body>"
    val main = run(html).getAs[String]("main_text")
    assert(main.contains("&lt;"), main)
    assert(!main.contains("<"), main)
  }
}
