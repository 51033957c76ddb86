package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column
import graft.operators.{HtmlExtract, UrlOps, PersistSlots}

/** Crawl-side queries: URL canonicalization, the host graph, and
  * crawl-frontier scheduling — the stages between
  * [[HtmlExtract.outlinks]] (this library's anchor extractor) and the
  * fetch loop of a crawl-scale corpus build. The corpus has no URL
  * column, so raw URLs are synthesized deterministically in both
  * engines from doc_id (text_pii's fixture discipline) with every
  * normalization rule exercised: mixed-case scheme/host, default and
  * explicit ports, duplicate slashes, "/./" and nested "/../"
  * segments, tracking parameters, unsorted parameters, fragments.
  *
  * Scale shapes: canonicalization is a narrow projection riding the
  * scan (zero shuffle); the host graph aggregates an
  * already-aggregated edge list (shuffle on the bounded domain key);
  * the frontier groups by canonical URL once, anti-joins the crawled
  * set on the same key, and runs ONE politeness window partitioned by
  * host — the per-host fetch-round assignment a polite crawler needs,
  * and the only per-URL window in the family (salt a pathological
  * mega-host before it if one dominates a real crawl).
  */
object CrawlQueries {

  /** The deterministic raw-URL fixture, shared by text_url_canon and
    * q_host_graph (and replayed verbatim in the oracles). */
  private def rawUrlOf: Column = {
    val id = col("doc_id")
    def s(c: Column) = c.cast("string")
    val scheme = when(id % 2 === 0, "HTTP").otherwise("https")
    val www = when(id % 4 === 0, "WWW.").otherwise("")
    val tld = when(id % 5 === 0, "co.uk").when(id % 5 === 1, "COM")
      .when(id % 5 === 2, "org").when(id % 5 === 3, "io").otherwise("net")
    val port = when(id % 3 === 0,
        when(id % 2 === 0, ":80").otherwise(":443"))
      .when(id % 3 === 1, ":8080").otherwise("")
    val path = when(id % 4 === 0, concat(lit("/a/./b/p"), s(id % 5)))
      .when(id % 4 === 1, concat(lit("/a/b/../c/p"), s(id % 5)))
      .when(id % 4 === 2, concat(lit("//x//y/p"), s(id % 5)))
      .otherwise(concat(lit("/p/q/r/../../s/p"), s(id % 5)))
    val qry = when(id % 3 === 0,
        concat(lit("?utm_source=feed&z=9&a="), s(id % 10), lit("&gclid=1")))
      .when(id % 3 === 1, lit("?b=2&a=1&utm_medium=email"))
      .otherwise(lit(""))
    val frag = when(id % 2 === 1, concat(lit("#sec-"), s(id)))
      .otherwise(lit(""))
    concat(scheme, lit("://"), www, lit("Site"), s(id % 7), lit("."), tld,
      port, path, qry, frag)
  }

  /** Outlink rows of the synthesized corpus pages — the one fixture
    * frame every crawl query starts from (its oracle-side replay is
    * the `ol` CTE each oracle builds from [[TextQueries.htmlBlocksCte]]).
    */
  private def pageLinks(s: SparkSession, dir: String): DataFrame =
    HtmlExtract.outlinks(
      Tables(s, dir, "documents")
        .select(col("doc_id"), TextQueries.synthHtml.as("html")), "html")

  /** Each page's base URL (mixed case on purpose — canonicalization
    * must normalize it). */
  private def pageBase: Column =
    concat(lit("HTTPS://Site"), (col("doc_id") % 7).cast("string"),
      lit(".Example.NET"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // per-URL canonicalization: raw spelling → the ONE canonical
    // spelling (RFC 3986 syntax normalization + tracking scrub +
    // sorted params) plus host and registrable domain. Narrow
    // projection, zero shuffle — scan speed at any scale.
    "text_url_canon" -> ((s, dir) => {
      val url = UrlOps.canonicalize(col("raw_url"))
      Tables(s, dir, "documents")
        .select(col("doc_id"), rawUrlOf.as("raw_url"))
        .select(col("doc_id"), col("raw_url"), url.as("url"))
        .select(col("doc_id"), col("raw_url"), col("url"),
          UrlOps.hostOf(col("url")).as("host"))
        .withColumn("domain", UrlOps.registrableDomain(col("host")))
    }),

    // registrable-domain link graph: per-domain out/in edge and
    // neighbor counts from the canonicalized edge list — the feed a
    // per-domain reputation (q_source_reputation / q_pagerank) rides.
    // The doc-level list collapses to <= |src|x|dst| domain pairs in
    // ONE map-combined agg; both rollups then ride the slot-persisted
    // edge list, so the corpus scans once.
    "q_host_graph" -> ((s, dir) => {
      val src = UrlOps.registrableDomain(
        concat(lit("feed.hub"), (col("doc_id") % 4).cast("string"),
          lit(".co.uk")))
      val edges = PersistSlots.swap("crawl.hostEdges",
        Tables(s, dir, "documents")
          // materialize each canonicalization stage in its own
          // projection (the text_url_canon discipline): composed
          // into ONE expression, registrableDomain references its
          // host argument ~6 times and each reference re-embeds the
          // whole ~19-regex canonicalize subtree — CollapseProject
          // keeps multiply-referenced non-cheap projections apart,
          // so staging evaluates the chain ONCE per row (measured
          // 15.4 process-CPU-s → ~2, same rows, same values)
          .select(col("doc_id"), UrlOps.canonicalize(rawUrlOf).as("__url"))
          .select(col("doc_id"), UrlOps.hostOf(col("__url")).as("__h"))
          .select(src.as("src_domain"),
            UrlOps.registrableDomain(col("__h")).as("dst_domain"))
          .groupBy(col("src_domain"), col("dst_domain"))
          .agg(count(lit(1)).as("n_links")))
      val out = edges.groupBy(col("src_domain").as("domain"))
        .agg(sum(col("n_links")).as("out_links"),
          count(lit(1)).as("out_domains"))
      val in = edges.groupBy(col("dst_domain").as("domain"))
        .agg(sum(col("n_links")).as("in_links"),
          count(lit(1)).as("in_domains"))
      out.join(in, Seq("domain"), "full_outer")
        .select(col("domain"),
          coalesce(col("out_links"), lit(0L)).as("out_links"),
          coalesce(col("out_domains"), lit(0L)).as("out_domains"),
          coalesce(col("in_links"), lit(0L)).as("in_links"),
          coalesce(col("in_domains"), lit(0L)).as("in_domains"))
    }),

    // crawl-frontier scheduling: page outlinks resolved against their
    // page's base, canonicalized, deduped by canonical URL with a
    // link-popularity count, anti-joined against the already-crawled
    // set, and assigned a per-host fetch round (one fetch per host
    // per round — the politeness discipline). One groupBy on the
    // canonical URL + one anti-join on the same key + one window
    // partitioned by host.
    "q_crawl_frontier" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val raw = concat(UrlOps.resolve(pageBase, col("href")),
        when(col("doc_id") % 2 === 0, "?utm_campaign=x").otherwise("#ref"))
      val cand = pageLinks(s, dir)
        .select(UrlOps.canonicalize(raw).as("url"))
        .groupBy(col("url")).agg(count(lit(1)).as("hits"))
      val crawled = Tables(s, dir, "documents")
        .filter(col("doc_id") % 3 === 0)
        .select(concat(lit("https://site"),
          (col("doc_id") % 7).cast("string"), lit(".example.net/doc/"),
          (col("doc_id") % 50).cast("string")).as("url"))
        .distinct()
      cand.join(crawled, Seq("url"), "left_anti")
        .select(col("url"), UrlOps.hostOf(col("url")).as("host"),
          col("hits"))
        .withColumn("fetch_round",
          row_number().over(Window.partitionBy(col("host"))
            .orderBy(col("hits").desc, col("url").asc)).cast("long"))
    }),

    // anchor-text aggregation: the classic link-text relevance /
    // labeling signal — terms of every anchor pointing AT a target
    // URL, counted and ranked per target (top 3). One explode over
    // the outlink rows, one (url, term) map-combined count, one
    // window PARTITIONED by url. At 100 TB the count collapses the
    // edge list before the window ever runs, and both shuffles ride
    // the same url key.
    "q_anchor_text" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val terms = pageLinks(s, dir).select(
          UrlOps.canonicalize(UrlOps.resolve(pageBase, col("href")))
            .as("url"),
          explode(filter(split(lower(col("anchor")), " "),
            w => w =!= "")).as("term"))
      terms.groupBy(col("url"), col("term"))
        .agg(count(lit(1)).as("n"))
        .withColumn("rank",
          row_number().over(Window.partitionBy(col("url"))
            .orderBy(col("n").desc, col("term").asc)).cast("long"))
        .filter(col("rank") <= 3)
    }),

    // robots.txt compliance: candidate URLs against each host's
    // parsed rule set under RFC 9309 longest-match (Allow wins
    // length ties; a decoy non-star group must be ignored; the
    // empty-Disallow allow-everything idiom parses to no rule).
    // Rules explode from ONE robots row per host (bounded), join on
    // the host key (broadcast at scale), and one composite-min agg
    // per URL picks verdict + matched prefix.
    "q_robots_filter" -> ((s, dir) => {
      val cand = PersistSlots.swap("crawl.robotsCand",
        pageLinks(s, dir).select(
            UrlOps.canonicalize(UrlOps.resolve(pageBase, col("href")))
              .as("url"))
          .distinct()
          .select(col("url"), UrlOps.hostOf(col("url")).as("host")))
      val k = regexp_extract(col("host"), "site([0-9]+)", 1).cast("int")
      val txt = concat(
        lit("User-agent: bot\nDisallow: /\nUser-agent: *\nCrawl-delay: "),
        (k + 1).cast("string"), lit("\nDisallow: /tags\n"),
        when(k % 2 === 0, "Disallow: /doc/\nAllow: /doc/1\n").otherwise(""),
        when(k % 3 === 0, "Disallow: /share\nAllow: /share\n").otherwise(""),
        lit("Disallow: \nAllow: /archive\n"))
      val hosts = cand.select(col("host")).distinct()
        .withColumn("robots_txt", txt)
      val hostRules = graft.operators.RobotsOps
        .rules(hosts, "robots_txt")
        .select(col("host"), col("rule_dir"), col("rule_pfx"))
      val delays = hosts.select(col("host"),
        graft.operators.RobotsOps.crawlDelay(col("robots_txt"))
          .as("crawl_delay"))
      graft.operators.RobotsOps
        .verdicts(cand, "url", "host", hostRules, "host")
        .join(delays, Seq("host"))
        .select(col("url"), col("host"), col("crawl_delay"),
          col("verdict"), col("matched_pfx"))
    }))

  // ---------------------------------------------------------------
  // DuckDB oracles — the canonicalization replay is generated once
  // (canonStages) so all three queries share the exact step order the
  // operator documents.
  // ---------------------------------------------------------------

  /** The raw-URL fixture as DuckDB SQL (must mirror [[rawUrlOf]]). */
  private val rawUrlSql: String =
    """CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'https' END || '://' ||
      |CASE WHEN doc_id % 4 = 0 THEN 'WWW.' ELSE '' END ||
      |'Site' || CAST(doc_id % 7 AS VARCHAR) || '.' ||
      |CASE WHEN doc_id % 5 = 0 THEN 'co.uk' WHEN doc_id % 5 = 1 THEN 'COM'
      |     WHEN doc_id % 5 = 2 THEN 'org' WHEN doc_id % 5 = 3 THEN 'io'
      |     ELSE 'net' END ||
      |CASE WHEN doc_id % 3 = 0 THEN
      |       CASE WHEN doc_id % 2 = 0 THEN ':80' ELSE ':443' END
      |     WHEN doc_id % 3 = 1 THEN ':8080' ELSE '' END ||
      |CASE WHEN doc_id % 4 = 0 THEN '/a/./b/p' || CAST(doc_id % 5 AS VARCHAR)
      |     WHEN doc_id % 4 = 1 THEN '/a/b/../c/p' || CAST(doc_id % 5 AS VARCHAR)
      |     WHEN doc_id % 4 = 2 THEN '//x//y/p' || CAST(doc_id % 5 AS VARCHAR)
      |     ELSE '/p/q/r/../../s/p' || CAST(doc_id % 5 AS VARCHAR) END ||
      |CASE WHEN doc_id % 3 = 0 THEN
      |       '?utm_source=feed&z=9&a=' || CAST(doc_id % 10 AS VARCHAR) || '&gclid=1'
      |     WHEN doc_id % 3 = 1 THEN '?b=2&a=1&utm_medium=email' ELSE '' END ||
      |CASE WHEN doc_id % 2 = 1 THEN '#sec-' || CAST(doc_id AS VARCHAR)
      |     ELSE '' END""".stripMargin

  /** Canonicalization stages over a CTE `rawu` carrying `raw_url`
    * (plus any key columns, carried through by SELECT *): produces
    * `cu` with `url` and `hst`. Step order mirrors
    * [[UrlOps.canonicalize]] exactly — including the TWO "/./"
    * passes (adjacent matches share a slash) and the THREE bounded
    * "seg/../" passes. */
  private val canonStages: String =
    """n0 AS (SELECT *, regexp_replace(raw_url, '#.*', '', 'g') AS nf FROM rawu),
      |n1 AS (SELECT *,
      |    lower(regexp_extract(nf, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS sch,
      |    regexp_extract(nf, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?]*)', 1) AS auth,
      |    regexp_replace(nf, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*', '', 'g') AS rst
      |  FROM n0),
      |n2 AS (SELECT *, lower(regexp_extract(auth, '^([^:]*)', 1)) AS hst,
      |    regexp_extract(auth, ':([0-9]+)$', 1) AS prt,
      |    regexp_extract(rst, '^([^?]*)', 1) AS p0,
      |    regexp_extract(rst, '\?(.*)', 1) AS q0
      |  FROM n1),
      |n3 AS (SELECT *, regexp_replace(
      |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      |    regexp_replace(regexp_replace(regexp_replace(
      |      CASE WHEN p0 = '' THEN '/' ELSE p0 END,
      |      '/{2,}', '/', 'g'),
      |      '/\./', '/', 'g'), '/\./', '/', 'g'), '/\./', '/', 'g'),
      |      '/\.$', '/', 'g'),
      |      '/[^/]+/\.\./', '/', 'g'), '/[^/]+/\.\./', '/', 'g'),
      |      '/[^/]+/\.\./', '/', 'g') AS pth0,
      |    coalesce(array_to_string(list_sort(list_filter(string_split(q0, '&'),
      |      p -> NOT regexp_matches(p,
      |        '^(utm_[A-Za-z0-9_]*|gclid|fbclid|msclkid|ref)=')
      |        AND p <> '')), '&'), '') AS qq
      |  FROM n2),
      |cu AS (SELECT *, sch || '://' || hst ||
      |    CASE WHEN prt = '' THEN ''
      |         WHEN sch = 'http' AND prt = '80' THEN ''
      |         WHEN sch = 'https' AND prt = '443' THEN ''
      |         ELSE ':' || prt END ||
      |    (CASE WHEN pth = '' THEN '/' ELSE pth END) ||
      |    CASE WHEN qq = '' THEN '' ELSE '?' || qq END AS url
      |  FROM (SELECT *, regexp_replace(regexp_replace(regexp_replace(
      |          regexp_replace(pth0, '^/\.\./', '/'), '^/\.\./', '/'),
      |          '^/\.\./', '/'), '^/\.\.$', '/') AS pth
      |        FROM n3))""".stripMargin

  /** Registrable-domain SQL over a host expression (mirrors
    * [[UrlOps.registrableDomain]]). */
  private def regDomSql(h: String): String =
    s"""CASE WHEN len(string_split($h, '.')) <= 2 THEN $h
       |     WHEN array_to_string(string_split($h, '.')[-2:], '.')
       |            IN ('co.uk', 'gov.uk', 'ac.uk', 'com.au', 'co.jp')
       |       THEN array_to_string(string_split($h, '.')[-3:], '.')
       |     ELSE array_to_string(string_split($h, '.')[-2:], '.') END""".stripMargin

  def oracles: Map[String, String] = Map(

    "text_url_canon" ->
      ("""WITH rawu AS (SELECT doc_id, """ + rawUrlSql +
        """ AS raw_url FROM documents),
          |""".stripMargin + canonStages +
        """
          |SELECT doc_id, raw_url, url, hst AS host,
          |  """.stripMargin + regDomSql("hst") + """ AS domain
          |FROM cu""".stripMargin),

    "q_host_graph" ->
      ("""WITH rawu AS (SELECT doc_id, """ + rawUrlSql +
        """ AS raw_url FROM documents),
          |""".stripMargin + canonStages +
        """,
          |d AS (SELECT """.stripMargin + regDomSql("hst") +
        """ AS dst_domain,
          |  """.stripMargin +
        regDomSql("'feed.hub' || CAST(doc_id % 4 AS VARCHAR) || '.co.uk'") +
        """ AS src_domain FROM cu),
          |e AS (SELECT src_domain, dst_domain, count(*) AS n_links
          |      FROM d GROUP BY 1, 2),
          |o AS (SELECT src_domain AS domain,
          |        CAST(sum(n_links) AS BIGINT) AS out_links,
          |        count(*) AS out_domains FROM e GROUP BY 1),
          |i AS (SELECT dst_domain AS domain,
          |        CAST(sum(n_links) AS BIGINT) AS in_links,
          |        count(*) AS in_domains FROM e GROUP BY 1)
          |SELECT coalesce(o.domain, i.domain) AS domain,
          |  CAST(coalesce(o.out_links, 0) AS BIGINT) AS out_links,
          |  CAST(coalesce(o.out_domains, 0) AS BIGINT) AS out_domains,
          |  CAST(coalesce(i.in_links, 0) AS BIGINT) AS in_links,
          |  CAST(coalesce(i.in_domains, 0) AS BIGINT) AS in_domains
          |FROM o FULL OUTER JOIN i ON o.domain = i.domain""".stripMargin),

    "q_crawl_frontier" ->
      (TextQueries.htmlBlocksCte +
        """,
          |ol AS (SELECT doc_id, unnest(regexp_extract_all(ch,
          |    '(?is)<a\s[^>]*href="([^"]*)"[^>]*>(.*?)</a>', 1)) AS href
          |  FROM c),
          |rawu AS (SELECT doc_id,
          |    'HTTPS://Site' || CAST(doc_id % 7 AS VARCHAR) || '.Example.NET'
          |    || href ||
          |    CASE WHEN doc_id % 2 = 0 THEN '?utm_campaign=x'
          |         ELSE '#ref' END AS raw_url
          |  FROM ol),
          |""".stripMargin + canonStages +
        """,
          |cand AS (SELECT url, hst AS host, count(*) AS hits
          |         FROM cu GROUP BY 1, 2),
          |crawled AS (SELECT DISTINCT 'https://site' ||
          |    CAST(doc_id % 7 AS VARCHAR) || '.example.net/doc/' ||
          |    CAST(doc_id % 50 AS VARCHAR) AS url
          |  FROM documents WHERE doc_id % 3 = 0),
          |f AS (SELECT * FROM cand WHERE NOT EXISTS
          |        (SELECT 1 FROM crawled w WHERE w.url = cand.url))
          |SELECT url, host, CAST(hits AS BIGINT) AS hits,
          |  CAST(row_number() OVER (PARTITION BY host
          |    ORDER BY hits DESC, url ASC) AS BIGINT) AS fetch_round
          |FROM f""".stripMargin),

    "q_anchor_text" ->
      (TextQueries.htmlBlocksCte +
        """,
          |l AS (SELECT doc_id,
          |    regexp_extract_all(ch,
          |      '(?is)<a\s[^>]*href="([^"]*)"[^>]*>(.*?)</a>', 1) AS hrefs,
          |    regexp_extract_all(ch,
          |      '(?is)<a\s[^>]*href="([^"]*)"[^>]*>(.*?)</a>', 2) AS anchors
          |  FROM c),
          |u AS (SELECT doc_id,
          |    unnest(range(1, len(hrefs) + 1)) AS r, hrefs, anchors
          |  FROM l),
          |rawu AS (SELECT doc_id,
          |    'HTTPS://Site' || CAST(doc_id % 7 AS VARCHAR) || '.Example.NET'
          |    || hrefs[r] AS raw_url,
          |    trim(regexp_replace(
          |      replace(replace(replace(replace(replace(replace(
          |        regexp_replace(anchors[r], '<[^>]*>', ' ', 'g'),
          |        '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
          |        '&#39;', chr(39)), '&nbsp;', ' '), '&amp;', '&'),
          |      '\s+', ' ', 'g')) AS anchor
          |  FROM u),
          |""".stripMargin + canonStages +
        """,
          |t AS (SELECT url,
          |    unnest(list_filter(string_split(lower(anchor), ' '),
          |      w -> w <> '')) AS term
          |  FROM cu),
          |g AS (SELECT url, term, count(*) AS n FROM t GROUP BY 1, 2)
          |SELECT url, term, CAST(n AS BIGINT) AS n, rank FROM (
          |  SELECT url, term, n,
          |    CAST(row_number() OVER (PARTITION BY url
          |      ORDER BY n DESC, term ASC) AS BIGINT) AS rank
          |  FROM g) WHERE rank <= 3""".stripMargin),

    "q_robots_filter" ->
      (TextQueries.htmlBlocksCte +
        """,
          |ol AS (SELECT doc_id, unnest(regexp_extract_all(ch,
          |    '(?is)<a\s[^>]*href="([^"]*)"[^>]*>(.*?)</a>', 1)) AS href
          |  FROM c),
          |rawu AS (SELECT doc_id,
          |    'HTTPS://Site' || CAST(doc_id % 7 AS VARCHAR) || '.Example.NET'
          |    || href AS raw_url
          |  FROM ol),
          |""".stripMargin + canonStages +
        """,
          |cand AS (SELECT DISTINCT url, hst AS host FROM cu),
          |hostk AS (SELECT host,
          |    CAST(regexp_extract(host, 'site([0-9]+)', 1) AS INTEGER) AS k
          |  FROM (SELECT DISTINCT host FROM cand)),
          |txts AS (SELECT host, 'User-agent: bot' || chr(10) ||
          |    'Disallow: /' || chr(10) || 'User-agent: *' || chr(10) ||
          |    'Crawl-delay: ' || CAST(k + 1 AS VARCHAR) || chr(10) ||
          |    'Disallow: /tags' || chr(10) ||
          |    CASE WHEN k % 2 = 0 THEN 'Disallow: /doc/' || chr(10) ||
          |         'Allow: /doc/1' || chr(10) ELSE '' END ||
          |    CASE WHEN k % 3 = 0 THEN 'Disallow: /share' || chr(10) ||
          |         'Allow: /share' || chr(10) ELSE '' END ||
          |    'Disallow: ' || chr(10) || 'Allow: /archive' || chr(10)
          |      AS txt
          |  FROM hostk),
          |sec AS (SELECT host, list_filter(
          |    string_split_regex(replace(txt, chr(13), ''),
          |      '(?i)User-agent:[ \t]*'),
          |    s -> starts_with(s, '*'))[1] AS sg
          |  FROM txts),
          |dl AS (SELECT host,
          |    CASE WHEN regexp_extract(sg,
          |        '(?i)Crawl-delay:[ \t]*([0-9]+)', 1) = ''
          |      THEN 0
          |      ELSE CAST(regexp_extract(sg,
          |        '(?i)Crawl-delay:[ \t]*([0-9]+)', 1)
          |                AS BIGINT) END AS crawl_delay
          |  FROM sec),
          |rl AS (SELECT host,
          |    regexp_extract_all(sg,
          |      '(?mi)^(Disallow|Allow):[ \t]*([^\n]*)', 1) AS dirs,
          |    regexp_extract_all(sg,
          |      '(?mi)^(Disallow|Allow):[ \t]*([^\n]*)', 2) AS pfxs
          |  FROM sec),
          |ri AS (SELECT host, unnest(range(1, len(dirs) + 1)) AS i,
          |    dirs, pfxs FROM rl),
          |rules AS (SELECT host,
          |    CASE WHEN lower(dirs[i]) = 'disallow' THEN 'Disallow'
          |         ELSE 'Allow' END AS rule_dir,
          |    trim(pfxs[i]) AS rule_pfx
          |  FROM ri WHERE trim(pfxs[i]) <> ''),
          |app AS (SELECT cd.url, cd.host, r.rule_dir, r.rule_pfx
          |  FROM cand cd JOIN rules r USING (host)
          |  WHERE starts_with(regexp_replace(cd.url,
          |    '^[A-Za-z][A-Za-z0-9+.-]*://[^/]*', '', 'g'), r.rule_pfx)),
          |best AS (SELECT url, max(length(rule_pfx)) AS maxlen
          |  FROM app GROUP BY 1),
          |win AS (SELECT a.url,
          |    min((CASE WHEN a.rule_dir = 'Disallow' THEN 'disallow'
          |         ELSE 'allow' END) || '|' || a.rule_pfx) AS w
          |  FROM app a JOIN best b
          |    ON a.url = b.url AND length(a.rule_pfx) = b.maxlen
          |  GROUP BY 1)
          |SELECT cd.url, cd.host, d.crawl_delay,
          |  CASE WHEN win.w IS NULL THEN 'allow'
          |       ELSE split_part(win.w, '|', 1) END AS verdict,
          |  CASE WHEN win.w IS NULL THEN ''
          |       ELSE split_part(win.w, '|', 2) END AS matched_pfx
          |FROM cand cd
          |LEFT JOIN win ON cd.url = win.url
          |JOIN dl d ON cd.host = d.host""".stripMargin))
}
