package graft

import graft.ext.UrlOps
import org.apache.spark.sql.functions._

/** Pins [[UrlOps.revisitMerge]] — the crawl-side CDC merge with
  * partial batches and explicit HTTP dispositions. */
class RevisitMergeSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    ("https://h.example.com/changed", "old body", "2026-01-01",
      "2026-01-15", true),
    ("https://h.example.com/same", "same body", "2026-01-01",
      "2026-01-15", true),
    ("https://h.example.com/valid", "kept body", "2026-01-01",
      "2026-01-15", true),
    ("https://h.example.com/tombed", "dead body", "2026-01-01",
      "2026-01-15", false),
    ("https://h.example.com/gone", "doomed body", "2026-01-01",
      "2026-01-15", true),
    ("https://h.example.com/flaky", "flaky body", "2026-01-01",
      "2026-01-15", true),
    ("https://h.example.com/unvisited", "quiet body", "2026-01-01",
      "2026-01-15", true))
    .toDF("url_canon", "body", "first_fetched", "last_validated",
      "is_active")

  private val revisits = Seq(
    ("https://h.example.com/changed", 200L, Some("new body")),
    ("https://h.example.com/same", 200L, Some("same body")),
    ("https://h.example.com/valid", 304L, None: Option[String]),
    ("https://h.example.com/tombed", 304L, None: Option[String]),
    ("https://h.example.com/gone", 404L, Some("not found page")),
    ("https://h.example.com/flaky", 503L, Some("try later")),
    ("https://h.example.com/brand-new", 200L, Some("fresh body")),
    ("https://h.example.com/phantom", 404L, Some("never knew it")))
    .toDF("url_canon", "http_status", "http_body")

  private def merged = UrlOps.revisitMerge(corpus, revisits,
      "url_canon", "http_status", "http_body", "body",
      lit("2026-02-10"))
    .collect()
    .map(r => r.getString(0) -> ((r.getString(1), r.getString(2),
      r.getString(3), r.getBoolean(4), r.getBoolean(5))))
    .toMap

  test("200 upserts: changed body flags body_changed, identical body " +
    "revalidates without the flag, unknown URL inserts") {
    val m = merged
    assert(m("https://h.example.com/changed") ==
      (("new body", "2026-01-01", "2026-02-10", true, true)))
    assert(m("https://h.example.com/same") ==
      (("same body", "2026-01-01", "2026-02-10", true, false)))
    assert(m("https://h.example.com/brand-new") ==
      (("fresh body", "2026-02-10", "2026-02-10", true, false)))
  }

  test("304 keeps the body, advances last_validated only, and " +
    "REACTIVATES a tombstoned URL") {
    val m = merged
    assert(m("https://h.example.com/valid") ==
      (("kept body", "2026-01-01", "2026-02-10", true, false)))
    assert(m("https://h.example.com/tombed") ==
      (("dead body", "2026-01-01", "2026-02-10", true, false)))
  }

  test("404 tombstones but retains the body; 5xx changes nothing; " +
    "unvisited rows pass through; unknown-URL non-200 merges nothing") {
    val m = merged
    assert(m("https://h.example.com/gone") ==
      (("doomed body", "2026-01-01", "2026-01-15", false, false)))
    assert(m("https://h.example.com/flaky") ==
      (("flaky body", "2026-01-01", "2026-01-15", true, false)))
    assert(m("https://h.example.com/unvisited") ==
      (("quiet body", "2026-01-01", "2026-01-15", true, false)))
    assert(!m.contains("https://h.example.com/phantom"))
    assert(m.size == 8)
  }

  test("merge is idempotent: re-applying the same revisit batch to " +
    "the merged state changes nothing but the already-set fields") {
    val once = UrlOps.revisitMerge(corpus, revisits, "url_canon",
      "http_status", "http_body", "body", lit("2026-02-10"))
    val twice = UrlOps.revisitMerge(
        once.drop("body_changed"), revisits, "url_canon",
        "http_status", "http_body", "body", lit("2026-02-10"))
      .collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getString(2),
        r.getString(3), r.getBoolean(4), r.getBoolean(5))))
      .toMap
    val first = once.collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getString(2),
        r.getString(3), r.getBoolean(4))))
      .toMap
    assert(twice.size == first.size)
    first.foreach { case (u, (b, ff, lv, act)) =>
      val (b2, ff2, lv2, act2, changed2) = twice(u)
      assert((b2, ff2, lv2, act2) == ((b, ff, lv, act)), u)
      assert(!changed2, s"$u: re-applied batch must not flag change")
    }
  }
}
