package graft

import org.apache.spark.sql.functions._
import graft.operators.UrlOps

/** URL canonicalization per-rule microscope (the gate exercises the
  * same operator over the synthesized corpus URLs; these are the
  * hand-picked edges of each normalization rule).
  */
class UrlOpsSpec extends SparkSpec {

  import spark.implicits._

  private def canon(u: String): String =
    Seq(u).toDF("u").select(UrlOps.canonicalize(col("u"))).as[String]
      .head()

  private def resolve(base: String, href: String): String =
    Seq((base, href)).toDF("b", "h")
      .select(UrlOps.resolve(col("b"), col("h"))).as[String].head()

  private def regDom(h: String): String =
    Seq(h).toDF("h").select(UrlOps.registrableDomain(col("h")))
      .as[String].head()

  test("scheme and host lowercase; default http port dropped") {
    assert(canon("HTTP://WWW.Example.COM:80/A/b") ===
      "http://www.example.com/A/b")
  }

  test("default https port dropped, non-default kept") {
    assert(canon("HTTPS://site.io:443/x") === "https://site.io/x")
    assert(canon("https://site.io:8080/x") === "https://site.io:8080/x")
  }

  test("fragment stripped; empty path becomes /") {
    assert(canon("https://a.com#frag") === "https://a.com/")
    assert(canon("https://a.com/p#frag?notquery") === "https://a.com/p")
  }

  test("duplicate slashes collapse; /./ and trailing /. removed") {
    assert(canon("https://a.com//x///y/./z/.") === "https://a.com/x/y/z/")
    assert(canon("https://a.com/a/././b") === "https://a.com/a/b")
  }

  test("dot-dot segments resolve up to the documented bound") {
    assert(canon("https://a.com/a/b/../c") === "https://a.com/a/c")
    assert(canon("https://a.com/p/q/r/../../s") === "https://a.com/p/s")
    assert(canon("https://a.com/a/b/c/../../../d") === "https://a.com/d")
  }

  test("above-root dot-dot residue dropped (RFC 3986)") {
    assert(canon("https://a.com/../x") === "https://a.com/x")
    assert(canon("https://a.com/../../x") === "https://a.com/x")
    assert(canon("https://a.com/..") === "https://a.com/")
  }

  test("a segment NAMED ..x is not above-root residue — it survives") {
    assert(canon("https://a.com/..foo/x") === "https://a.com/..foo/x")
    assert(canon("https://a.com/a/..b") === "https://a.com/a/..b")
  }

  test("adjacent /./ runs clear within the documented three passes") {
    assert(canon("https://a.com/a/./././././b") === "https://a.com/a/b")
  }

  test("tracking params scrubbed, survivors sorted, empty query no ?") {
    assert(canon("https://a.com/p?utm_source=x&z=9&a=1&gclid=7") ===
      "https://a.com/p?a=1&z=9")
    assert(canon("https://a.com/p?utm_campaign=only") === "https://a.com/p")
    assert(canon("https://a.com/p?b=2&a=1") === "https://a.com/p?a=1&b=2")
  }

  test("resolve: absolute passthrough, protocol-relative, root, dir") {
    assert(resolve("https://a.com/d/p", "http://b.com/x") ===
      "http://b.com/x")
    assert(resolve("https://a.com/d/p", "//b.com/x") === "https://b.com/x")
    assert(resolve("https://a.com/d/p", "/x") === "https://a.com/x")
    assert(resolve("https://a.com/d/p", "x.html") ===
      "https://a.com/d/x.html")
    assert(resolve("https://a.com", "x.html") === "https://a.com/x.html")
  }

  test("registrable domain: deep subdomain, multi-part suffix, short") {
    assert(regDom("a.b.site.com") === "site.com")
    assert(regDom("www.site.co.uk") === "site.co.uk")
    assert(regDom("site.net") === "site.net")
    assert(regDom("localhost") === "localhost")
  }

  test("canonical idempotence: canon(canon(u)) == canon(u)") {
    val us = Seq("HTTP://WWW.Example.COM:80//a/./b/../c?z=1&utm_ref=x#f",
      "https://Site3.io:8080/p/q/r/../../s?b=2&a=1")
    us.foreach { u => val c = canon(u); assert(canon(c) === c) }
  }
}
