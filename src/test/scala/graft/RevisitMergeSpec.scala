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

  test("revisitStream: two micro-batches over disjoint URL sets end " +
    "in byte-identical state to the one-shot merge; CDC emissions " +
    "carry exactly the batch's URLs with body_changed") {
    import graft.streaming.RevisitStream
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files
      .createTempDirectory("graft_revst").toString + "/state"
    RevisitStream.initState(corpus, dir)
    val rows = revisits.collect()
      .map(r => (r.getString(0), r.getLong(1),
        Option(r.getString(2)))).toSeq
    val (b1, b2) = rows.splitAt(4)
    val in = MemoryStream[(String, Long, Option[String])]
    val emissions =
      scala.collection.mutable.ArrayBuffer.empty[Seq[(String, Boolean)]]
    val q = RevisitStream.start(
        in.toDF().toDF("url_canon", "http_status", "http_body"),
        "url_canon", "http_status", "http_body", "body", dir,
        nowFor = _ => lit("2026-02-10")) { cdc =>
      emissions.synchronized {
        emissions += cdc.select("url_canon", "body_changed").collect()
          .map(r => (r.getString(0), r.getBoolean(1))).toSeq
      }
    }
    try {
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val got = RevisitStream.state(spark, dir)
      .collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getString(2),
        r.getString(3), r.getBoolean(4)))).toMap
    val want = UrlOps.revisitMerge(corpus, revisits, "url_canon",
        "http_status", "http_body", "body", lit("2026-02-10"))
      .collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getString(2),
        r.getString(3), r.getBoolean(4)))).toMap
    assert(got == want && got.size == 8)
    // CDC: each batch emitted exactly its own mergeable URLs (the
    // phantom 404-of-unknown contributes nothing), flags correct
    assert(emissions.size == 2)
    val e1 = emissions.head.toMap
    assert(e1.keySet == b1.map(_._1).toSet)
    assert(e1("https://h.example.com/changed") &&
      !e1("https://h.example.com/same"))
    val e2 = emissions(1).toMap
    assert(e2.keySet == b2.map(_._1).toSet - "https://h.example.com/phantom")
  }

  test("revisitStream 304-reactivation across cycles: a URL " +
    "tombstoned in one cycle reactivates when a later cycle's origin " +
    "answers 304; replaying a cycle with its own clock is a no-op") {
    import graft.streaming.RevisitStream
    val dir = java.nio.file.Files
      .createTempDirectory("graft_revst2").toString + "/state"
    RevisitStream.initState(corpus, dir)
    val u = "https://h.example.com/valid"
    def st(): Map[String, (String, Boolean)] =
      RevisitStream.state(spark, dir).collect()
        .map(r => r.getString(0) -> ((r.getString(3), r.getBoolean(4))))
        .toMap
    // cycle 1: the origin 410s the URL — tombstone
    RevisitStream.applyBatch(spark,
      Seq((u, 410L, None: Option[String]))
        .toDF("url_canon", "http_status", "http_body"),
      "url_canon", "http_status", "http_body", "body", dir,
      lit("2026-02-10"))
    assert(st()(u) == (("2026-01-15", false)))
    // cycle 2: the origin answers 304 — it exists again; reactivate
    RevisitStream.applyBatch(spark,
      Seq((u, 304L, None: Option[String]))
        .toDF("url_canon", "http_status", "http_body"),
      "url_canon", "http_status", "http_body", "body", dir,
      lit("2026-02-17"))
    assert(st()(u) == (("2026-02-17", true)))
    // replay of cycle 2 (at-least-once delivery): state unchanged
    val before = st()
    RevisitStream.applyBatch(spark,
      Seq((u, 304L, None: Option[String]))
        .toDF("url_canon", "http_status", "http_body"),
      "url_canon", "http_status", "http_body", "body", dir,
      lit("2026-02-17"))
    assert(st() == before)
  }

  test("log-backed revisit state: append-only micro-batches reach the " +
    "one-shot merge state, compaction folds history without changing " +
    "it, and a replayed batch is absorbed by latest-wins") {
    import graft.streaming.RevisitStream
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val loc = java.nio.file.Files.createTempDirectory("graft_rvlog").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_rvldb LOCATION '$loc'")
    val table = "graft_rvldb.corpus_log"
    RevisitStream.initLog(corpus, "url_canon", "body", table,
      nBuckets = 4)
    val rows = revisits.collect()
      .map(r => (r.getString(0), r.getLong(1),
        Option(r.getString(2)))).toSeq
    val (b1, b2) = rows.splitAt(4)
    val in = MemoryStream[(String, Long, Option[String])]
    val q = RevisitStream.startLog(
        in.toDF().toDF("url_canon", "http_status", "http_body"),
        "url_canon", "http_status", "http_body", "body", table,
        nowFor = _ => lit("2026-02-10"))()
    try {
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    def state(): Map[String, (String, String, String, Boolean)] =
      RevisitStream.logState(spark, table, "url_canon", "body")
        .collect()
        .map(r => r.getString(0) -> ((r.getString(1), r.getString(2),
          r.getString(3), r.getBoolean(4)))).toMap
    val want = UrlOps.revisitMerge(corpus, revisits, "url_canon",
        "http_status", "http_body", "body", lit("2026-02-10"))
      .collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getString(2),
        r.getString(3), r.getBoolean(4)))).toMap
    assert(state() == want && want.size == 8)
    // the log grew APPEND-ONLY: 7 bootstrap versions + each batch's
    // mergeable rows as new versions (phantom contributes nothing)
    val logRows = spark.table(table).count()
    assert(logRows == 7 + 4 + 3, s"log rows $logRows")
    // replay of cycle 2 under its own seq: latest-wins absorbs it
    RevisitStream.applyBatchLog(spark,
      b2.toDF("url_canon", "http_status", "http_body"),
      "url_canon", "http_status", "http_body", "body", table,
      seq = 2L, lit("2026-02-10"))
    assert(state() == want)
    // compaction: history folds to the live edge, state unchanged
    RevisitStream.compactLog(spark, table, "url_canon", "body",
      nBuckets = 4)
    assert(state() == want)
    assert(spark.table(table).count() == 8)
    // fsck green post-compaction; a DIVERGENT same-seq version (two
    // writers racing a cycle) trips versions_consistent
    import graft.ext.IndexAudit
    assert(IndexAudit.auditRevisitLog(spark, table, "url_canon")
      .filter(!col("ok")).count() == 0)
    Seq(("https://h.example.com/changed", "RACED BODY", "2026-01-01",
        "2026-02-10", true, 0L))
      .toDF("url_canon", "body", "first_fetched", "last_validated",
        "is_active", "__seq")
      .write.mode("append").insertInto(table)
    val bad = IndexAudit.auditRevisitLog(spark, table, "url_canon")
      .filter(!col("ok")).collect().map(_.getString(0)).toSet
    assert(bad == Set("versions_consistent"), bad)
  }

  test("startLog with compactEvery: the cadence maintenance folds the " +
    "log inside the loop — final state identical to the one-shot " +
    "merge, history bounded to the live edge") {
    import graft.streaming.RevisitStream
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val loc = java.nio.file.Files.createTempDirectory("graft_rvce").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_rvcedb LOCATION '$loc'")
    val table = "graft_rvcedb.corpus_log"
    RevisitStream.initLog(corpus, "url_canon", "body", table, nBuckets = 4)
    val rows = revisits.collect()
      .map(r => (r.getString(0), r.getLong(1),
        Option(r.getString(2)))).toSeq
    val (b1, b2) = rows.splitAt(4)
    val in = MemoryStream[(String, Long, Option[String])]
    val q = RevisitStream.startLog(
      in.toDF().toDF("url_canon", "http_status", "http_body"),
      "url_canon", "http_status", "http_body", "body", table,
      nowFor = _ => lit("2026-02-10"), compactEvery = 2)()
    try {
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val got = RevisitStream.logState(spark, table, "url_canon", "body")
      .collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getString(2),
        r.getString(3), r.getBoolean(4)))).toMap
    val want = UrlOps.revisitMerge(corpus, revisits, "url_canon",
        "http_status", "http_body", "body", lit("2026-02-10"))
      .collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getString(2),
        r.getString(3), r.getBoolean(4)))).toMap
    assert(got == want && got.size == 8)
    // batch 2 ended with the in-loop compaction: live edge only, and
    // the compacted layout kept the table's own bucket count
    assert(spark.table(table).count() == 8)
    assert(spark.sessionState.catalog.getTableMetadata(
        spark.sessionState.sqlParser.parseTableIdentifier(table))
      .bucketSpec.map(_.numBuckets).contains(4))
    assert(graft.ext.IndexAudit.auditRevisitLog(spark, table, "url_canon")
      .filter(!col("ok")).count() == 0)
  }

  test("startLog restart safety: a NEW uncheckpointed stream over a " +
    "persisted log (batchId resets to 0) derives seq from the stored " +
    "log, so fresh revisit results land ABOVE the applied history " +
    "instead of tying with it — including right after a compaction") {
    import graft.streaming.RevisitStream
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val loc = java.nio.file.Files.createTempDirectory("graft_rvrst").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_rvrdb LOCATION '$loc'")
    val table = "graft_rvrdb.corpus_log"
    RevisitStream.initLog(corpus, "url_canon", "body", table, nBuckets = 4)
    val u = "https://h.example.com/changed"
    def run(row: (String, Long, Option[String]), now: String): Unit = {
      val in = MemoryStream[(String, Long, Option[String])]
      val q = RevisitStream.startLog(
        in.toDF().toDF("url_canon", "http_status", "http_body"),
        "url_canon", "http_status", "http_body", "body", table,
        nowFor = _ => lit(now))()
      try { in.addData(row); q.processAllAvailable() } finally q.stop()
    }
    // stream 1 applies cycle 1 (seq lands at 1), then the process dies
    run((u, 200L, Some("zzz cycle-1 body")), "2026-02-10")
    // stream 2 is a FRESH query: its batchId restarts at 0, but the
    // derived seq must clear the persisted history. The bodies are
    // chosen so a seq TIE would pick the stale one (struct-max falls
    // through to the body string) — the exact silent-discard the
    // restart contract exists to prevent.
    run((u, 200L, Some("aaa cycle-2 body")), "2026-02-17")
    def live(): (String, String) = {
      val r = RevisitStream.logState(spark, table, "url_canon", "body")
        .filter(col("url_canon") === u).head
      (r.getString(1), r.getString(3))
    }
    assert(live() == (("aaa cycle-2 body", "2026-02-17")))
    // no same-seq duplicate was written: the replay fsck stays green
    assert(graft.ext.IndexAudit.auditRevisitLog(spark, table, "url_canon")
      .filter(!col("ok")).count() == 0)
    // after compaction (stored seqs reset to 0) a third fresh stream
    // still appends above the live edge
    RevisitStream.compactLog(spark, table, "url_canon", "body",
      nBuckets = 4)
    assert(!spark.catalog.tableExists(s"${table}__compact"))
    run((u, 200L, Some("bbb cycle-3 body")), "2026-02-24")
    assert(live() == (("bbb cycle-3 body", "2026-02-24")))
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
