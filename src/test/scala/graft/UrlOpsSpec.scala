package graft

import graft.ext.UrlOps
import org.apache.spark.sql.functions._

/** Gates for URL canonicalization (q150/q151): one spec case per
  * canonicalization rule in [[graft.ext.UrlOps.canonicalUrl]]'s
  * contract, plus equal-URL collapse and the host rollup's exact
  * integer arithmetic.
  */
class UrlOpsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(u: String): String =
    Seq(u).toDF("url").select(UrlOps.canonicalUrl(col("url"))).head.getString(0)

  test("scheme and host lowercase; path case preserved") {
    assert(canon("HTTPS://Example.COM/Docs/A") === "https://example.com/Docs/A")
  }

  test("fragment dropped") {
    assert(canon("https://example.com/p#Section-2") === "https://example.com/p")
    assert(canon("https://example.com/#top") === "https://example.com/")
  }

  test("default port stripped, non-default kept, cross-scheme kept") {
    assert(canon("http://example.com:80/p") === "http://example.com/p")
    assert(canon("https://example.com:443/p") === "https://example.com/p")
    assert(canon("http://example.com:8080/p") === "http://example.com:8080/p")
    // :443 is NOT http's default — load-bearing, kept
    assert(canon("http://example.com:443/p") === "http://example.com:443/p")
  }

  test("leading www. label dropped — only as a whole label, only leading") {
    assert(canon("https://www.example.com/p") === "https://example.com/p")
    // 'wwwx' is not the www label; 'sub.www.x' is not leading
    assert(canon("https://wwwx.example.com/p") === "https://wwwx.example.com/p")
    assert(canon("https://sub.www.example.com/p")
      === "https://sub.www.example.com/p")
  }

  test("path: doubled slashes collapse, trailing slash drops, empty -> /") {
    assert(canon("https://example.com//a///b/") === "https://example.com/a/b")
    assert(canon("https://example.com") === "https://example.com/")
    assert(canon("https://example.com/") === "https://example.com/")
  }

  test("tracking params removed by prefix, rest sorted, empty query dropped") {
    assert(canon("https://example.com/p?b=2&utm_source=feed&a=1")
      === "https://example.com/p?a=1&b=2")
    assert(canon("https://example.com/p?gclid=X&fbclid=Y&msclkid=Z&ref=r")
      === "https://example.com/p")
    // prefix match is against 'name=': refresh=1 is NOT ref=
    assert(canon("https://example.com/p?refresh=1&ref=x")
      === "https://example.com/p?refresh=1")
    assert(canon("https://example.com/p?") === "https://example.com/p")
  }

  test("query-param order never splits a canonical group") {
    assert(canon("https://example.com/p?a=1&b=2&c=3")
      === canon("HTTPS://EXAMPLE.COM/p?c=3&b=2&a=1#frag"))
  }

  test("withCanonicalUrl flags: tracking and fragment presence") {
    val out = UrlOps.withCanonicalUrl(
      Seq("https://a.com/p?utm_x=1", "https://a.com/p#f", "https://a.com/p")
        .toDF("url"), "url")
      .select(col("url_had_tracking"), col("url_had_fragment"))
      .collect().map(r => (r.getBoolean(0), r.getBoolean(1))).toSeq
    assert(out === Seq((true, false), (false, true), (false, false)))
  }

  test("hostRollup: exact counts and integer-micro dup rate") {
    // host a.com: 4 fetches over 2 canonical urls (2 syntactic variants
    // each) -> dup_rate = (4-2)*1e6 div 4 = 500000. host b.com: 3
    // fetches, 3 urls -> 0.
    val urls = Seq(
      "https://www.a.com/x?utm_s=1", "https://a.com/x",
      "HTTP://A.COM:80/y", "http://a.com/y/",
      "https://b.com/1", "https://b.com/2", "https://b.com/3").toDF("url")
    val roll = UrlOps.hostRollup(urls, "url")
      .select("url_host", "n_fetches", "n_urls", "n_tracking_fetches",
        "dup_rate_micro")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1).toSeq
    assert(roll === Seq(("a.com", 4L, 2L, 1L, 500000L),
      ("b.com", 3L, 3L, 0L, 0L)))
  }

  test("canonicalization is idempotent") {
    val raw = Seq("HTTPS://WWW.Ex.COM:443//A//B/?b=2&utm_q=9&a=1#f")
    val once = canon(raw.head)
    assert(canon(once) === once)
  }
}
