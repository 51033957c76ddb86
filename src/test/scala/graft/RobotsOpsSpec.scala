package graft

import org.apache.spark.sql.functions._
import graft.operators.RobotsOps

/** robots.txt parsing + RFC 9309 longest-match verdicts: hand-built
  * rule sets pin the decoy-group skip, the length-tie-to-Allow rule,
  * the empty-Disallow idiom, missing star group, and missing
  * Crawl-delay. (The gate's q_robots_filter exercises the same
  * operator over the synthesized corpus hosts.)
  */
class RobotsOpsSpec extends SparkSpec {

  import spark.implicits._

  private val robots =
    "User-agent: bot\nDisallow: /\n" + // decoy group: must be ignored
      "User-agent: *\nCrawl-delay: 3\n" +
      "Disallow: /private\n" +
      "Disallow: /doc/\nAllow: /doc/pub\n" +
      "Disallow: /tie\nAllow: /tie\n" + // equal length: Allow wins
      "Disallow: \n" // allow-everything idiom: no rule

  private def verdictOf(urls: Seq[String]): Map[String, (String, String)] = {
    val cand = urls.map(u => (u, "h1")).toDF("url", "host")
    val rules = RobotsOps.rules(
      Seq(("h1", robots)).toDF("host", "robots_txt"), "robots_txt")
      .select("host", "rule_dir", "rule_pfx")
    RobotsOps.verdicts(cand, "url", "host", rules, "host")
      .select("url", "verdict", "matched_pfx")
      .as[(String, String, String)].collect()
      .map { case (u, v, m) => u -> (v, m) }.toMap
  }

  test("longest match, decoy skip, tie to Allow, no-match allow") {
    val v = verdictOf(Seq(
      "https://h1/",              // decoy's Disallow: / must NOT apply
      "https://h1/private/x",
      "https://h1/doc/2",
      "https://h1/doc/pub/2",     // Allow /doc/pub (7) beats /doc/ (5)
      "https://h1/tie/x",         // equal length: Allow wins (RFC 9309)
      "https://h1/other"))
    assert(v("https://h1/") === ("allow", ""))
    assert(v("https://h1/private/x") === ("disallow", "/private"))
    assert(v("https://h1/doc/2") === ("disallow", "/doc/"))
    assert(v("https://h1/doc/pub/2") === ("allow", "/doc/pub"))
    assert(v("https://h1/tie/x") === ("allow", "/tie"))
    assert(v("https://h1/other") === ("allow", ""))
  }

  test("rules: star group only, empty-Disallow dropped") {
    val r = RobotsOps.rules(
      Seq(("h1", robots)).toDF("host", "robots_txt"), "robots_txt")
      .select("rule_dir", "rule_pfx").as[(String, String)].collect().toSet
    assert(r === Set(("Disallow", "/private"), ("Disallow", "/doc/"),
      ("Allow", "/doc/pub"), ("Disallow", "/tie"), ("Allow", "/tie")))
  }

  test("RFC 9309 tolerance: case, missing space, CRLF, padded values") {
    val sloppy = "user-AGENT:*\r\ncrawl-delay:7\r\n" +
      "disallow:/private\r\nALLOW: /private/pub \r\ndisallow: \r\n"
    val df = Seq(("h1", sloppy)).toDF("host", "robots_txt")
    val r = RobotsOps.rules(df, "robots_txt")
      .select("rule_dir", "rule_pfx").as[(String, String)].collect().toSet
    assert(r === Set(("Disallow", "/private"), ("Allow", "/private/pub")))
    assert(df.select(RobotsOps.crawlDelay(col("robots_txt")))
      .as[Long].head() === 7L)
    val v = RobotsOps.verdicts(
      Seq(("https://h1/private/x", "h1")).toDF("url", "host"),
      "url", "host",
      RobotsOps.rules(df, "robots_txt").select("host", "rule_dir",
        "rule_pfx"), "host")
      .select("verdict").as[String].head()
    assert(v === "disallow") // a CRLF file must NOT fail open
  }

  test("crawl delay parsed; 0 when absent; no star group = no rules") {
    val d = Seq(("h1", robots), ("h2", "User-agent: *\nDisallow: /x\n"),
        ("h3", "User-agent: bot\nDisallow: /\n"))
      .toDF("host", "robots_txt")
    val delays = d.select(col("host"),
      RobotsOps.crawlDelay(col("robots_txt")).as("cd"))
      .as[(String, Long)].collect().toMap
    assert(delays === Map("h1" -> 3L, "h2" -> 0L, "h3" -> 0L))
    val r3 = RobotsOps.rules(d.filter(col("host") === "h3"), "robots_txt")
    assert(r3.count() === 0)
  }
}
