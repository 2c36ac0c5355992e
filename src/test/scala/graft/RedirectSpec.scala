package graft

import graft.ext.UrlOps
import org.apache.spark.sql.functions._

/** Pins [[UrlOps.resolveRedirects]]: bounded-hop chain following over
  * the (url, status, location) response relation — multi-hop chains,
  * relative Locations, A→B→A and self loops, the hop cap, dangling
  * finals, and the non-redirect statuses that must not edge.
  */
class RedirectSpec extends SparkSpec {
  import spark.implicits._

  private def resolve(rows: Seq[(String, Long, String)], maxHops: Int = 5) =
    UrlOps.resolveRedirects(
      rows.toDF("url", "status", "location"), "url", "status", "location",
      maxHops)
      .collect()
      .map(r => r.getString(0) ->
        ((if (r.isNullAt(1)) null else r.getString(1)),
          r.getLong(2), r.getString(3)))
      .toMap

  test("single hop to a non-redirect target resolves in one hop") {
    val out = resolve(Seq(
      ("https://a.example.com/x", 301L, "https://b.example.com/y"),
      ("https://b.example.com/y", 200L, "")))
    assert(out == Map(
      "https://a.example.com/x" ->
        (("https://b.example.com/y", 1L, "resolved"))))
  }

  test("multi-hop chain resolves to the terminus; every hop emits a row") {
    val out = resolve(Seq(
      ("https://a.example.com/1", 301L, "https://b.example.com/2"),
      ("https://b.example.com/2", 302L, "https://c.example.com/3"),
      ("https://c.example.com/3", 200L, "")))
    assert(out("https://a.example.com/1") ==
      (("https://c.example.com/3", 2L, "resolved")))
    assert(out("https://b.example.com/2") ==
      (("https://c.example.com/3", 1L, "resolved")))
  }

  test("relative Location resolves against the fetched URL (root and path)") {
    val out = resolve(Seq(
      ("https://a.example.com/dir/page", 302L, "/rooted"),
      ("https://a.example.com/dir/page2", 302L, "sibling")))
    assert(out("https://a.example.com/dir/page") ==
      (("https://a.example.com/rooted", 1L, "resolved")))
    assert(out("https://a.example.com/dir/page2") ==
      (("https://a.example.com/dir/sibling", 1L, "resolved")))
  }

  test("Location canonicalizes: the chain is followed in canonical space") {
    val out = resolve(Seq(
      ("https://a.example.com/x", 301L,
        "HTTPS://WWW.B.EXAMPLE.COM:443/y?b=2&a=1&utm_source=f#frag"),
      ("https://b.example.com/y?a=1&b=2", 200L, "")))
    assert(out("https://a.example.com/x") ==
      (("https://b.example.com/y?a=1&b=2", 1L, "resolved")))
  }

  test("A-B-A cycle flags loop at the closing hop, null final") {
    val out = resolve(Seq(
      ("https://a.example.com/p", 301L, "https://b.example.com/q"),
      ("https://b.example.com/q", 301L, "https://a.example.com/p")))
    assert(out("https://a.example.com/p") == ((null, 2L, "loop")))
    assert(out("https://b.example.com/q") == ((null, 2L, "loop")))
  }

  test("self-redirect flags loop at hop 1") {
    val out = resolve(Seq(
      ("https://a.example.com/self", 308L, "https://a.example.com/self")))
    assert(out("https://a.example.com/self") == ((null, 1L, "loop")))
  }

  test("chain longer than maxHops reports cap at the cap hop") {
    val chain = (1 to 6).map(i =>
      (s"https://h.example.com/$i", 307L, s"https://h.example.com/${i + 1}"))
    val out = resolve(chain, maxHops = 3)
    assert(out("https://h.example.com/1") ==
      (("https://h.example.com/4", 3L, "cap")))
    // three from the end, the chain fits inside the cap
    assert(out("https://h.example.com/4") ==
      (("https://h.example.com/7", 3L, "resolved")))
  }

  test("dangling target (never fetched) still resolves") {
    val out = resolve(Seq(
      ("https://a.example.com/gone", 303L, "https://elsewhere.org/new")))
    assert(out("https://a.example.com/gone") ==
      (("https://elsewhere.org/new", 1L, "resolved")))
  }

  test("non-redirect statuses and empty Locations contribute no rows") {
    val out = resolve(Seq(
      ("https://a.example.com/ok", 200L, "https://b.example.com/ignored"),
      ("https://a.example.com/err", 404L, ""),
      ("https://a.example.com/no-loc", 301L, "")))
    assert(out.isEmpty)
  }
}
