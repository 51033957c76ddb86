package graft

import org.apache.spark.sql.functions._
import graft.operators.LineFilter

/** C4-style line-level cleaning: per-rule keep/drop behavior and the
  * per-document counters. (The driver's synthetic documents carry no
  * newlines, so this stage is pinned here rather than by a DuckDB
  * oracle — same treatment as the Arrow source and streaming ops.)
  */
class LineFilterSpec extends SparkSpec {

  import spark.implicits._

  test("keeps sentence lines, drops short/unpunctuated/code/boilerplate") {
    val text = Seq(
      "This is a fine sentence that ends well.",      // keep
      "Too short.",                                    // drop: < 3 words
      "this line has no terminal punctuation at all",  // drop: no [.!?"]
      "function f() { return 1; }",                    // drop: brace
      "Lorem ipsum dolor sit amet something.",         // drop: lorem ipsum
      "We use cookies to improve your experience.",    // drop: cookies
      "Please enable JavaScript to view this page.",   // drop: javascript
      "  A padded line also survives trimming!  ",     // keep (trimmed)
      "",                                              // drop: empty
      "Is this a kept question?"                       // keep
    ).mkString("\n")
    val out = LineFilter(Seq((1L, text)).toDF("id", "text"), "text")
      .collect().head
    assert(out.getAs[Long]("n_lines") == 10)
    assert(out.getAs[Long]("n_kept") == 3)
    val clean = out.getAs[String]("clean_text").split("\n")
    assert(clean === Array(
      "This is a fine sentence that ends well.",
      "A padded line also survives trimming!",
      "Is this a kept question?"))
    assert(out.getAs[Long]("kept_chars") == clean.map(_.length.toLong).sum)
  }

  test("document with no surviving lines yields null clean_text") {
    val out = LineFilter(Seq((1L, "nope\nstill nope")).toDF("id", "text"), "text")
      .collect().head
    assert(out.getAs[String]("clean_text") == null)
    assert(out.getAs[Long]("n_kept") == 0)
    assert(out.getAs[Long]("kept_chars") == 0)
  }

  test("input columns pass through unchanged") {
    val out = LineFilter(
      Seq((7L, "Keep this good sentence here.", "web")).toDF("id", "text", "src"),
      "text")
    assert(out.columns.toSeq ==
      Seq("id", "text", "src", "clean_text", "n_lines", "n_kept", "kept_chars"))
    assert(out.select("src").as[String].head() == "web")
  }

  test("minWords knob: stricter threshold drops three-word lines") {
    val df = Seq((1L, "One two three.\nOne two three four five.")).toDF("id", "text")
    assert(LineFilter(df, "text", minWords = 5).collect().head
      .getAs[Long]("n_kept") == 1)
    assert(LineFilter(df, "text", minWords = 3).collect().head
      .getAs[Long]("n_kept") == 2)
  }
}
