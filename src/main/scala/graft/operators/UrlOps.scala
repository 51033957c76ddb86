package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization and host arithmetic — the crawl-frontier
  * companion to [[HtmlExtract.outlinks]]: raw hrefs from a crawl are
  * resolved against their page's base, normalized to ONE spelling per
  * resource (RFC 3986 §6 syntax-based normalization plus the
  * tracking-parameter scrub every production crawler applies), and
  * rolled up to hosts / registrable domains for the host graph,
  * politeness scheduling, and per-domain reputation.
  *
  * Everything is string/array expressions — narrow, zero shuffle,
  * scan speed; at 100 TB canonicalization runs alongside the outlink
  * explode and only the DEDUPED canonical URLs ever reach a shuffle.
  * Every regex is RE2-safe and every step replays verbatim in DuckDB
  * (the oracle shares the step order via [[CrawlQueries.canonSql]]).
  *
  * Normalization contract (documented bounds, not silent ones):
  *   - fragment dropped; scheme and host lowercased; default ports
  *     (http:80, https:443) dropped, others kept;
  *   - path: empty → "/", duplicate slashes collapsed, "/./" runs
  *     removed (three global passes — up to ~7 ADJACENT "/./"
  *     segments; a fixpoint loop is not expressible as one narrow
  *     expression) and a trailing "/." removed, "segment/../"
  *     resolved up to [[DotDotPasses]] levels of nesting (real-world
  *     crawl paths nest 1-2 deep). Beyond either bound the residue
  *     stays VERBATIM, which is safe: two URLs only ever MISS a
  *     merge, never merge wrongly. Above-root "/../" residue is
  *     dropped last per RFC 3986's remove_dot_segments — matched as
  *     full segments only ("/..third" is a legal segment NAME and
  *     must survive, or the host and path would fuse);
  *   - query: parameters split on "&", tracking keys removed
  *     ([[TrackingRe]]: utm_*, gclid, fbclid, msclkid, ref), the
  *     rest SORTED (param order never distinguishes resources in
  *     practice and unordered spellings are the top near-dup URL
  *     source), empty query → no "?".
  */
object UrlOps {

  /** "/a/../" nesting levels resolved; deeper residue left verbatim. */
  val DotDotPasses = 3

  /** Tracking parameters scrubbed from query strings (anchored). */
  val TrackingRe = "^(utm_[A-Za-z0-9_]*|gclid|fbclid|msclkid|ref)="

  private val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"

  /** Resolve an href against its page's base URL (absolute base with
    * authority). Absolute hrefs pass through; "//host/x" takes the
    * base's scheme; "/x" the base's origin; anything else appends to
    * the base's directory. */
  def resolve(base: Column, href: Column): Column = {
    val scheme = regexp_extract(base, SchemeRe, 1)
    val origin = regexp_extract(base, "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)
    // base directory: origin + path up to (and including) the last
    // slash; a base with no path slash gets "/".
    val basePath = regexp_extract(base, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val dir = when(basePath.contains("/"),
      regexp_replace(basePath, "[^/]*$", "")).otherwise("/")
    when(href.rlike(SchemeRe), href)
      .when(href.startsWith("//"), concat(scheme, lit(":"), href))
      .when(href.startsWith("/"), concat(origin, href))
      .otherwise(concat(origin, dir, href))
  }

  /** RFC 3986 syntax-based canonical form of an ABSOLUTE http(s) URL
    * (see object doc for the exact contract). */
  def canonicalize(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*", "")
    val scheme = lower(regexp_extract(noFrag, SchemeRe, 1))
    val authority = regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?]*)", 1)
    val rest = regexp_replace(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*", "")
    val host = lower(regexp_extract(authority, "^([^:]*)", 1))
    val port = regexp_extract(authority, ":([0-9]+)$", 1)
    val portPart = when(port === "", lit(""))
      .when(scheme === "http" && port === "80", lit(""))
      .when(scheme === "https" && port === "443", lit(""))
      .otherwise(concat(lit(":"), port))
    val path0 = regexp_extract(rest, "^([^?]*)", 1)
    val query0 = regexp_extract(rest, "\\?(.*)", 1)
    // path normalization, step order mirrored in the oracle:
    // dup slashes, "/./" (three passes: adjacent matches share a
    // slash, each global pass halves a run), trailing "/.", bounded
    // "seg/../" resolution, then above-root residue — "/../" as a
    // FULL segment only, so a segment merely named "..x" survives
    // (stripping its "/.." prefix would fuse host and path).
    val p1 = regexp_replace(when(path0 === "", lit("/")).otherwise(path0),
      "/{2,}", "/")
    val p2 = (1 to 3).foldLeft(p1)((c, _) =>
      regexp_replace(c, "/\\./", "/"))
    val p3 = regexp_replace(p2, "/\\.$", "/")
    val p4 = (1 to DotDotPasses).foldLeft(p3)((c, _) =>
      regexp_replace(c, "/[^/]+/\\.\\./", "/"))
    val path = regexp_replace(
      (1 to DotDotPasses).foldLeft(p4)((c, _) =>
        regexp_replace(c, "^/\\.\\./", "/")),
      "^/\\.\\.$", "/")
    val params = filter(split(query0, "&"),
      p => !p.rlike(TrackingRe) && p =!= "")
    val q = array_join(array_sort(params), "&")
    concat(scheme, lit("://"), host, portPart,
      when(path === "", lit("/")).otherwise(path),
      when(q === "", lit("")).otherwise(concat(lit("?"), q)))
  }

  /** Host of a canonical URL (no lowering — canonical already is). */
  def hostOf(url: Column): Column =
    regexp_extract(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?]*)", 1),
      "^([^:]*)", 1)

  /** Multi-label public suffixes the mini-PSL resolves (the full
    * public-suffix list is a data file in production; the operator's
    * shape — longest-suffix label arithmetic — is the same). */
  val MultiPartSuffixes: Seq[String] =
    Seq("co.uk", "gov.uk", "ac.uk", "com.au", "co.jp")

  /** Registrable domain of a host: suffix + one label — "a.b.site.com"
    * → "site.com", "www.site.co.uk" → "site.co.uk". Hosts at or under
    * two labels pass through. */
  def registrableDomain(host: Column): Column = {
    val labels = split(host, "\\.")
    val last2 = array_join(slice(labels, -2, 2), ".")
    when(size(labels) <= 2, host)
      .when(last2.isin(MultiPartSuffixes: _*) && size(labels) >= 3,
        array_join(slice(labels, -3, 3), "."))
      .otherwise(last2)
  }
}
