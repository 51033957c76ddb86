package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** robots.txt parsing and URL filtering — the compliance stage
  * between frontier scheduling ([[graft.queries.CrawlQueries]]'s
  * q_crawl_frontier) and the fetch loop: a crawler may only fetch
  * URLs the host's robots.txt allows, at the pace its Crawl-delay
  * asks for.
  *
  * Matching follows the REP (RFC 9309) longest-match rule: among the
  * `User-agent: *` group's Allow/Disallow prefixes that match the
  * URL's path, the LONGEST wins; on a length tie Allow wins (RFC
  * 9309 §2.2.2's least-strict rule); no matching rule means allow.
  * Empty-value `Disallow:` lines are the spec's allow-everything
  * idiom and parse to no rule.
  *
  * Shapes: parsing is narrow string/array expressions per robots
  * row (one row per HOST — thousands, not billions); the filter is
  * a host-key join of candidates against the EXPLODED rule list
  * (bounded per host) followed by one longest-match aggregation per
  * URL — at 100 TB the rules side broadcasts and the per-URL work
  * rides the frontier's existing URL-key partitioning.
  */
object RobotsOps {

  /** The `User-agent: *` group's text of a robots.txt — tolerant the
    * way RFC 9309 §2.1 requires of a parser: directive names are
    * case-insensitive, the space after the colon is optional, and
    * CRLF files parse like LF (the \r is stripped first, or every
    * captured value would carry a dead trailing \r that can never
    * match a URL path — a compliance filter failing OPEN). Sections
    * split on the header (no RE2-unsafe lookahead). */
  def starSection(txt: Column): Column =
    get(filter(split(replace(txt, lit("\r"), lit("")),
        "(?i)User-agent:[ \t]*"),
      s => s.startsWith("*")), lit(0))

  /** Crawl-delay (seconds) of the star group; 0 when absent. */
  def crawlDelay(txt: Column): Column = {
    val d = regexp_extract(starSection(txt),
      "(?i)Crawl-delay:[ \t]*([0-9]+)", 1)
    when(d === "" || d.isNull, lit(0L)).otherwise(d.cast("long"))
  }

  /** Parse one robots.txt column into exploded (rule_dir, rule_pfx)
    * rows — star-group Allow/Disallow lines only (any case, space
    * after the colon optional, values trimmed), `rule_dir`
    * normalized to "Disallow"/"Allow", empty prefixes dropped (the
    * allow-everything idiom). Input columns are kept. */
  def rules(df: DataFrame, txtCol: String): DataFrame = {
    val sec = starSection(col(txtCol))
    val pat = "(?mi)^(Disallow|Allow):[ \t]*([^\n]*)"
    val zipped = arrays_zip(
      regexp_extract_all(sec, lit(pat), lit(1)).as("dir"),
      regexp_extract_all(sec, lit(pat), lit(2)).as("pfx"))
    df.withColumn("__r", explode(filter(
        transform(zipped, r => struct(
          when(lower(r.getField("dir")) === "disallow", "Disallow")
            .otherwise("Allow").as("dir"),
          trim(r.getField("pfx")).as("pfx"))),
        r => r.getField("pfx") =!= "")))
      .select(df.columns.map(col) ++ Seq(
        col("__r.dir").as("rule_dir"), col("__r.pfx").as("rule_pfx")): _*)
  }

  /** Filter candidate URLs against per-host rules: `cand` must carry
    * (urlCol, hostCol), `hostRules` the exploded output of [[rules]]
    * plus the host key. Returns cand's columns + `verdict`
    * ("allow"/"disallow") + `matched_pfx` ("" when no rule matched).
    *
    * Longest-match: max prefix length per URL, Allow beats Disallow
    * on ties (RFC 9309), lexicographically-smallest prefix of the
    * winning direction as the reported match (deterministic). */
  def verdicts(cand: DataFrame, urlCol: String, hostCol: String,
               hostRules: DataFrame, rulesHostCol: String): DataFrame = {
    val path = regexp_replace(col(urlCol), "^[A-Za-z][A-Za-z0-9+.-]*://[^/]*", "")
    val app = cand
      .select(col(urlCol), col(hostCol), path.as("__path"))
      .join(hostRules.withColumnRenamed(rulesHostCol, hostCol),
        Seq(hostCol))
      .filter(col("__path").startsWith(col("rule_pfx")))
    val best = app.groupBy(col(urlCol))
      .agg(max(length(col("rule_pfx"))).as("__maxlen"))
    val winners = app.join(best, Seq(urlCol))
      .filter(length(col("rule_pfx")) === col("__maxlen"))
      .groupBy(col(urlCol))
      // one composite min picks verdict AND match: 'allow|…' sorts
      // before 'disallow|…' (the RFC tie rule), and within the
      // winning direction the lexicographically-smallest prefix
      .agg(min(concat_ws("|",
        when(col("rule_dir") === "Disallow", "disallow")
          .otherwise("allow"),
        col("rule_pfx"))).as("__win"))
    cand.join(winners, Seq(urlCol), "left_outer")
      .select(cand.columns.map(col) ++ Seq(
        coalesce(substring_index(col("__win"), "|", 1), lit("allow"))
          .as("verdict"),
        coalesce(substring_index(col("__win"), "|", -1), lit(""))
          .as("matched_pfx")): _*)
  }
}
