package graft

import graft.ext.{Dedup, UrlOps}
import org.apache.spark.sql.functions._

/** Pins the `<link rel="canonical">` harvest
  * ([[UrlOps.withDeclaredCanonical]]) and the declared-canonical dedup
  * pick ([[Dedup.declaredCanonicalPick]]).
  */
class DeclaredCanonicalSpec extends SparkSpec {
  import spark.implicits._

  private def decl(html: String,
      base: String = "https://a.example.com/p/1"): Option[String] = {
    val out = UrlOps.withDeclaredCanonical(
      Seq((html, base)).toDF("html", "url"), "html", "url", "url")
      .select("decl_canon").head()
    if (out.isNullAt(0)) None else Some(out.getString(0))
  }

  test("harvest: both attribute orders, stylesheet decoy never matches") {
    assert(decl("<head><link rel=\"canonical\" " +
      "href=\"https://a.example.com/c\"></head>") ==
      Some("https://a.example.com/c"))
    assert(decl("<head><link href=\"https://a.example.com/c\" " +
      "rel=\"canonical\"></head>") ==
      Some("https://a.example.com/c"))
    assert(decl("<head><link rel=\"stylesheet\" href=\"/css/m.css\">" +
      "</head>") == None)
    // the decoy beside a real declaration must not shadow it
    assert(decl("<head><link rel=\"stylesheet\" href=\"/css/m.css\">" +
      "<link rel=\"canonical\" href=\"/c2\"></head>") ==
      Some("https://a.example.com/c2"))
  }

  test("harvest: relative hrefs resolve and canonicalize against the " +
    "fetched URL; case-insensitive tag") {
    assert(decl("<LINK REL=\"canonical\" HREF=\"/dir/Page\">") ==
      Some("https://a.example.com/dir/Page"))
    assert(decl("<link rel=\"canonical\" " +
      "href=\"HTTPS://WWW.A.EXAMPLE.COM/x?b=2&a=1&utm_s=9\">") ==
      Some("https://a.example.com/x?a=1&b=2"))
  }

  test("harvest: absent html or dropped-kind hrefs give null") {
    assert(decl("<p>no links</p>") == None)
    assert(decl("<link rel=\"canonical\" href=\"mailto:x@y.z\">") == None)
  }

  private val pages = Seq(
    // group A: doc 2 declared by every member (in-host) — beats min-id 1
    (1L, "https://h.example.com/a/v1",
      Some("https://h.example.com/a/v2"), "hashA"),
    (2L, "https://h.example.com/a/v2",
      Some("https://h.example.com/a/v2"), "hashA"),
    (3L, "https://h.example.com/a/v3",
      Some("https://h.example.com/a/v2"), "hashA"),
    // group B: cross-host declaration ignored — min-id 4 wins
    (4L, "https://h.example.com/b/v1",
      Some("https://evil.example.net/b"), "hashB"),
    (5L, "https://h.example.com/b/v2",
      Some("https://evil.example.net/b"), "hashB"),
    // group C: declaration names a non-member — min-id 6 wins
    (6L, "https://h.example.com/c/v1",
      Some("https://h.example.com/c/master"), "hashC"),
    (7L, "https://h.example.com/c/v2", None, "hashC"),
    // group D: no declarations at all
    (8L, "https://h.example.com/d/v1", None, "hashD"))
    .toDF("doc_id", "url", "decl_canon", "content_hash")

  test("pick: in-host declared member beats min-id; cross-host and " +
    "non-member declarations fall back; singleton groups keep min-id") {
    val out = Dedup.declaredCanonicalPick(pages, "doc_id", "url",
        "decl_canon", "content_hash")
      .select("doc_id", "canonical_id", "cluster_size", "is_canonical")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getBoolean(3)))).toMap
    assert(out(1L) == ((2L, 3L, false)))
    assert(out(2L) == ((2L, 3L, true)))
    assert(out(3L) == ((2L, 3L, false)))
    assert(out(4L) == ((4L, 2L, true)))
    assert(out(5L) == ((4L, 2L, false)))
    assert(out(6L) == ((6L, 2L, true)))
    assert(out(7L) == ((6L, 2L, false)))
    assert(out(8L) == ((8L, 1L, true)))
  }

  test("pick: disagreeing in-host declarations tie to the smallest " +
    "matched member id") {
    val split = Seq(
      (10L, "https://h.example.com/e/v1",
        Some("https://h.example.com/e/v3"), "hashE"),
      (11L, "https://h.example.com/e/v2", None, "hashE"),
      (12L, "https://h.example.com/e/v3",
        Some("https://h.example.com/e/v2"), "hashE"))
      .toDF("doc_id", "url", "decl_canon", "content_hash")
    val canon = Dedup.declaredCanonicalPick(split, "doc_id", "url",
        "decl_canon", "content_hash")
      .filter(col("is_canonical")).select("doc_id").as[Long].collect()
    // both v2 (11) and v3 (12) are declared by someone — smallest wins
    assert(canon.toSeq == Seq(11L))
  }
}
