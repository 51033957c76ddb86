package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML main-content extraction — the jusText/trafilatura-shaped
  * boilerplate stage every crawl-scale corpus build starts at
  * (Pomikálek 2011; Barbaresi 2021), and the stage BEFORE
  * [[LineFilter]]'s C4 line rules in a real pipeline: raw HTML is
  * segmented into BLOCKS at block-level tag boundaries, each block is
  * kept or dropped by integer rules on its own geometry — link
  * density (chars of anchor text / chars of text), tag density
  * (tags per word), stopword share, block length — and the kept
  * blocks' tag-stripped text joins into the document's main text.
  *
  * Everything is array expressions over the HTML string — narrow,
  * zero shuffle, the same scan-speed plan shape as [[LineFilter]]: at
  * 100 TB the extraction runs alongside the WARC/parquet read, which
  * is the only shape that survives (any shuffle on raw crawl bytes
  * would dominate the whole pipeline; the downstream stages — Gopher
  * rules, dedup, selection — see only the extracted text, a ~5-10x
  * byte reduction on real crawls).
  *
  * Rule discipline: thresholds are integer e4 fixed-point on
  * NONNEGATIVE operands, every regex is RE2-safe (no backreferences,
  * no lookaround — lazy quantifiers and inline (?is) flags only), and
  * entity decoding is plain `replace` with `&amp;` decoded LAST — so
  * a DuckDB oracle replays the pipeline verbatim.
  *
  * Classification is FIRST-FAILING, mirroring jusText's block
  * classifier in spirit:
  *   1. `empty_or_short` — fewer than `minWords` words survive the
  *      tag strip (head remnants, image-only rows, separators);
  *   2. `link_heavy`     — anchor-text chars > `maxLinkE4`/1e4 of
  *      text chars (nav bars, footers, related-links lists: the
  *      signature jusText rule);
  *   3. `tag_soup`       — more than `maxTagsPerWordE4`/1e4 inline
  *      tags per word (markup-dominated rows that carry no prose);
  *   4. `short_no_stop`  — shorter than `longWords` words AND a
  *      stopword share under `minStopE4`/1e4 (jusText's short-block
  *      heuristic: short fragments need function-word evidence to
  *      count as prose; long blocks pass on length alone);
  *   5. `kept`.
  */
object HtmlExtract {

  /** Tags that terminate a text block when jusText segments a page —
    * their open/close/self-closing forms all become block breaks. */
  private val BlockTagRe =
    "(?i)</?(p|div|h[1-6]|li|ul|ol|nav|footer|header|article|section|" +
      "table|tr|th|td|blockquote|pre|br|hr)(\\s[^>]*)?/?>"

  /** Function words whose presence separates prose from boilerplate
    * fragments (jusText ships per-language lists; this is the English
    * core restricted to words the synthetic corpus can actually
    * produce plus the usual suspects). */
  val Stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "it")

  final case class Params(minWords: Int = 3, longWords: Int = 10,
                          maxLinkE4: Int = 2000, maxTagsPerWordE4: Int = 5000,
                          minStopE4: Int = 300)

  /** Head cleanup: script/style subtrees (content and all) and HTML
    * comments removed wholesale. Separate per-tag patterns — a single
    * alternation `<(script|style)>.*?</(script|style)>` has no
    * backreference in RE2, so it could close a script with a stray
    * style tag. */
  def preClean(html: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(html, "(?is)<script[^>]*>.*?</script\\s*>", " "),
        "(?is)<style[^>]*>.*?</style\\s*>", " "),
      "(?s)<!--.*?-->", " ")

  /** Minimal entity decode on tag-stripped text; `&amp;` last, the
    * standard order (decoding it first would double-decode
    * `&amp;lt;`). Plain `replace`, identical in DuckDB. */
  def decodeEntities(t: Column): Column = {
    val steps = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
    steps.foldLeft(t) { case (c, (from, to)) => replace(c, lit(from), lit(to)) }
  }

  /** One block's visible text: tags out, entities decoded, whitespace
    * collapsed to single spaces, trimmed. */
  def blockText(raw: Column): Column =
    trim(regexp_replace(
      decodeEntities(regexp_replace(raw, "<[^>]*>", " ")), "\\s+", " "))

  /** Raw block array of a page: head junk removed, block-level tags
    * turned into breaks, split; whitespace-only fragments between
    * adjacent breaks dropped (they are separator artifacts, not
    * blocks — counting them would triple `n_blocks` on tag-dense
    * pages and dilute every share metric). */
  def rawBlocks(html: Column): Column =
    filter(split(regexp_replace(preClean(html), BlockTagRe, "\n"), "\n"),
      b => trim(b) =!= "")

  /** Per-block (txt, reason) struct array — the shared classifier
    * both [[extract]] and [[profile]] ride. Two transform passes: the
    * first computes the raw-geometry metrics (anchor chars and tag
    * count need the RAW block; they're gone after the strip), the
    * second classifies on them. */
  def classifiedBlocks(html: Column, p: Params = Params()): Column = {
    val measured = transform(rawBlocks(html), b => struct(
      blockText(b).as("txt"),
      coalesce(
        aggregate(
          regexp_extract_all(b, lit("(?i)<a[^>]*>([^<]*)</a>"), lit(1)),
          lit(0L), (acc, x) => acc + length(x)),
        lit(0L)).as("link_chars"),
      size(regexp_extract_all(b, lit("<[^>]*>"), lit(0)))
        .cast("long").as("n_tags")))
    transform(measured, m => {
      val txt = m.getField("txt")
      val nWords = when(txt === "", lit(0L))
        .otherwise(size(split(txt, " ")).cast("long"))
      val stopCnt = size(filter(split(lower(txt), " "),
        w => w.isin(Stopwords: _*))).cast("long")
      // floors on nonnegative operands only — portable to DuckDB
      val linkE4 = floor(m.getField("link_chars") * 10000 / length(txt))
      val tagsPwE4 = floor(m.getField("n_tags") * 10000 / nWords)
      val stopE4 = floor(stopCnt * 10000 / nWords)
      struct(
        txt.as("txt"),
        when(nWords < p.minWords, "empty_or_short")
          .when(linkE4 > p.maxLinkE4, "link_heavy")
          .when(tagsPwE4 > p.maxTagsPerWordE4, "tag_soup")
          .when(nWords < p.longWords && stopE4 < p.minStopE4,
            "short_no_stop")
          .otherwise("kept").as("reason"))
    })
  }

  /** Per-document extraction: input columns + `n_blocks` / `n_kept`
    * counters, `main_text` (kept blocks' text joined by newline, null
    * when nothing survives — [[LineFilter]]'s convention) and
    * `main_chars`. */
  def extract(df: DataFrame, htmlCol: String,
              p: Params = Params()): DataFrame = {
    val out = df.withColumn("__cls", classifiedBlocks(col(htmlCol), p))
      .withColumn("__kept", filter(col("__cls"),
        c => c.getField("reason") === "kept"))
    out.select(df.columns.map(col) ++ Seq(
      size(col("__cls")).cast("long").as("n_blocks"),
      size(col("__kept")).cast("long").as("n_kept"),
      when(size(col("__kept")) > 0,
        array_join(transform(col("__kept"), c => c.getField("txt")), "\n"))
        .as("main_text")): _*)
      .withColumn("main_chars",
        coalesce(length(col("main_text")).cast("long"), lit(0L)))
  }

  /** Outbound links: one row per anchor in DOCUMENT ORDER — the
    * crawl-frontier / host-graph feed (outlinks seed the next fetch
    * round and the link edges a source-reputation PageRank rides).
    * `rank` is the 1-based position of the anchor on the page, `href`
    * the raw attribute value, `anchor` the tag-stripped
    * entity-decoded anchor text, `section` the href's first path
    * segment (the coarse by-section rollup key; '' for the root).
    *
    * Two regexp_extract_all passes over the SAME pattern align
    * positionally (group 1 = href, group 2 = inner text), zipped and
    * position-exploded — one explode, no shuffle, scan speed. Links
    * inside script/style/comments are gone before extraction
    * ([[preClean]]). */
  def outlinks(df: DataFrame, htmlCol: String): DataFrame = {
    val pat = "(?is)<a\\s[^>]*href=\"([^\"]*)\"[^>]*>(.*?)</a>"
    val cleaned = preClean(col(htmlCol))
    val zipped = arrays_zip(
      regexp_extract_all(cleaned, lit(pat), lit(1)).as("href"),
      regexp_extract_all(cleaned, lit(pat), lit(2)).as("anchor"))
    df.select(df.columns.map(col) :+ posexplode(zipped): _*)
      .select(df.columns.map(col) ++ Seq(
        (col("pos") + 1).cast("long").as("rank"),
        col("col.href").as("href"),
        blockText(col("col.anchor")).as("anchor"),
        regexp_extract(col("col.href"), "^/([A-Za-z0-9_-]+)", 1)
          .as("section")): _*)
  }

  /** Corpus-wide line-rule profile: blocks per classification reason
    * with e4 shares — the dial a pipeline operator reads before
    * loosening/tightening a rule. One explode + one map-combined
    * aggregation to <= 5 rows. */
  def profile(df: DataFrame, htmlCol: String,
              p: Params = Params()): DataFrame = {
    val reasons = df.select(explode(classifiedBlocks(col(htmlCol), p))
        .as("c"))
      .select(col("c.reason").as("reason"))
    val counts = reasons.groupBy(col("reason"))
      .agg(count(lit(1)).as("n_blocks"))
    val total = counts.agg(sum(col("n_blocks")).as("total_blocks"))
    counts.crossJoin(broadcast(total))
      .select(col("reason"), col("n_blocks"), col("total_blocks"),
        floor(col("n_blocks") * 10000 / col("total_blocks"))
          .cast("long").as("share_e4"))
  }
}
