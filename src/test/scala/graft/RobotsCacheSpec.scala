package graft

import graft.ext.{IndexAudit, RobotsCache, UrlOps}
import org.apache.spark.sql.functions._

/** The persisted robots cache: latest-wins reads, TTL gating from
  * STORED fetch timestamps, the streaming refetch loop, and fsck.
  */
class RobotsCacheSpec extends SparkSpec {
  import spark.implicits._

  private val H = 3600000000L // one hour in micros
  private val asOf = 1770681600000000L // 2026-02-10 00:00:00 UTC

  private def mkDb(tag: String): String = {
    val loc = java.nio.file.Files.createTempDirectory(s"graft_$tag").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_${tag}db LOCATION '$loc'")
    s"graft_${tag}db.$tag"
  }

  test("rebuild + latestRules: the live rule set equals an in-plan " +
    "parse of each host's newest body; superseded and rule-less " +
    "fetches keep their fetch-log rows but serve no stale rules") {
    val table = mkDb("rc1")
    val fetches = Seq(
      // a.com: old fetch disallows /x, newer fetch disallows /y —
      // only the newer rules may serve
      ("a.com", asOf - 30 * H, "User-agent: *\nDisallow: /x"),
      ("a.com", asOf - 2 * H, "User-agent: *\nDisallow: /y"),
      // b.com: one fresh fetch with an allow-all (rule-less) body
      ("b.com", asOf - 1 * H, "User-agent: *\nDisallow:"),
      // c.com: one stale fetch with rules
      ("c.com", asOf - 48 * H, "User-agent: *\nDisallow: /private"))
      .toDF("host", "fetched_at_micros", "robots_body")
    RobotsCache.rebuild(fetches, "host", "fetched_at_micros",
      "robots_body", table, nBuckets = 2)
    val live = RobotsCache.latestRules(spark, table)
      .select("host", "path_prefix", "allow")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getBoolean(2))).toSet
    assert(live == Set(("a.com", "/y", false),
      ("c.com", "/private", false)))
    // parity with the one-shot parser over the newest body per host
    val newest = Seq(("a.com", "User-agent: *\nDisallow: /y"),
      ("b.com", "User-agent: *\nDisallow:"),
      ("c.com", "User-agent: *\nDisallow: /private"))
      .toDF("host", "body")
    val want = UrlOps.parseRobotsTxt(newest, "host", "body", "*")
      .select("host", "path_prefix", "allow")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getBoolean(2))).toSet
    assert(live == want)
    // every fetch logged, even the rule-less and superseded ones
    assert(spark.table(s"${table}_fetches").count() == 4)
    // ages come from the stored timestamps, floored to whole hours
    val ages = RobotsCache.ages(spark, table, asOf)
      .collect().map(r => r.getString(0) ->
        r.getLong(r.fieldIndex("robots_age_hours"))).toMap
    assert(ages == Map("a.com" -> 2L, "b.com" -> 1L, "c.com" -> 48L))
  }

  test("ttlGate: stale hosts (and never-fetched hosts) must refetch " +
    "robots first; a refresh with a newer fetch flips the gate") {
    val table = mkDb("rc2")
    RobotsCache.rebuild(Seq(
        ("fresh.com", asOf - 3 * H, "User-agent: *\nDisallow: /p"),
        ("stale.com", asOf - 30 * H, "User-agent: *\nDisallow: /q"))
        .toDF("host", "fetched_at_micros", "robots_body"),
      "host", "fetched_at_micros", "robots_body", table, nBuckets = 2)
    val budget = Seq(("fresh.com", 3L), ("stale.com", 2L),
      ("newhost.com", 1L)).toDF("link_host", "n_budgeted")
    def gate(): Map[String, (Boolean, String)] =
      RobotsCache.ttlGate(spark, budget, "link_host", table, asOf)
        .collect().map(r => r.getString(0) ->
          ((r.getBoolean(r.fieldIndex("robots_stale")),
            r.getString(r.fieldIndex("action"))))).toMap
    val before = gate()
    assert(before("fresh.com") == ((false, "proceed")))
    assert(before("stale.com") == ((true, "refetch_robots_first")))
    // never fetched: no cached permissions at all — must fetch first
    assert(before("newhost.com") == ((true, "refetch_robots_first")))
    // the refetch lands (the crawl loop obeying the gate): both
    // formerly-gated hosts flip to proceed
    RobotsCache.refresh(Seq(
        ("stale.com", asOf - 1 * H, "User-agent: *\nDisallow: /q2"),
        ("newhost.com", asOf, "User-agent: *\nDisallow: /n"))
        .toDF("host", "fetched_at_micros", "robots_body"),
      "host", "fetched_at_micros", "robots_body", table)
    val after = gate()
    assert(after("stale.com") == ((false, "proceed")))
    assert(after("newhost.com") == ((false, "proceed")))
    assert(after("fresh.com") == ((false, "proceed")))
    // and the live rules moved with the refetch (latest-wins)
    val live = RobotsCache.latestRules(spark, table)
      .filter(col("host") === "stale.com")
      .select("path_prefix").collect().map(_.getString(0)).toSeq
    assert(live == Seq("/q2"))
  }

  test("streaming refetch loop: robotsFetchStream appends per " +
    "micro-batch and the TTL gate flips the batch after the refetch " +
    "arrives") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val table = mkDb("rc3")
    // bootstrap: an aged fetch, then serve via the stream
    RobotsCache.rebuild(Seq(
        ("s.com", asOf - 40 * H, "User-agent: *\nDisallow: /old"))
        .toDF("host", "fetched_at_micros", "robots_body"),
      "host", "fetched_at_micros", "robots_body", table, nBuckets = 2)
    val budget = Seq(("s.com", 5L)).toDF("link_host", "n_budgeted")
    def stale(): Boolean = RobotsCache
      .ttlGate(spark, budget, "link_host", table, asOf)
      .head.getBoolean(3)
    assert(stale())
    val in = MemoryStream[(String, Long, String)]
    val q = graft.streaming.EventStreams.robotsFetchStream(
      in.toDF().toDF("host", "fetched_at_micros", "robots_body"),
      "host", "fetched_at_micros", "robots_body", table)
    try {
      // batch 1: an unrelated host's fetch — s.com stays gated
      in.addData(("other.com", asOf - 1 * H, "User-agent: *\nDisallow: /z"))
      q.processAllAvailable()
      assert(stale())
      // batch 2: s.com's refetch lands — the gate flips and the live
      // rules are the refetched ones
      in.addData(("s.com", asOf - 1 * H, "User-agent: *\nDisallow: /new"))
      q.processAllAvailable()
      assert(!stale())
      val live = RobotsCache.latestRules(spark, table)
        .filter(col("host") === "s.com")
        .select("path_prefix").collect().map(_.getString(0)).toSeq
      assert(live == Seq("/new"))
    } finally q.stop()
    // fsck green after the streamed appends
    assert(IndexAudit.auditRobotsCache(spark, table)
      .filter(!col("ok")).count() == 0)
  }

  test("fsck: a replayed fetch trips uniqueness and an orphan rules " +
    "row trips the fetch-log check") {
    val table = mkDb("rc4")
    val f = Seq(("a.com", asOf - 1 * H, "User-agent: *\nDisallow: /x"))
      .toDF("host", "fetched_at_micros", "robots_body")
    RobotsCache.rebuild(f, "host", "fetched_at_micros", "robots_body",
      table, nBuckets = 2)
    assert(IndexAudit.auditRobotsCache(spark, table)
      .filter(!col("ok")).count() == 0)
    // replay the same fetch: duplicate log row + duplicate rule rows
    RobotsCache.refresh(f, "host", "fetched_at_micros", "robots_body",
      table)
    val bad1 = IndexAudit.auditRobotsCache(spark, table)
      .filter(!col("ok")).collect().map(_.getString(0)).toSet
    assert(bad1 == Set("fetch_log_unique", "rule_rows_unique"), bad1)
    // orphan rules: a rules row whose fetch never logged
    val table2 = mkDb("rc5")
    RobotsCache.rebuild(f, "host", "fetched_at_micros", "robots_body",
      table2, nBuckets = 2)
    Seq(("ghost.com", asOf, "/g", false, false, false))
      .toDF("host", "fetched_at_micros", "path_prefix", "allow",
        "from_specific", "has_wildcard")
      .write.mode("append").insertInto(table2)
    val bad2 = IndexAudit.auditRobotsCache(spark, table2)
      .filter(!col("ok")).collect().map(_.getString(0)).toSet
    assert(bad2 == Set("rules_have_fetch"), bad2)
  }

  test("the cache-backed frontier loop: frontierStream re-resolves " +
    "the LIVE rules per micro-batch, so a robots refetch landed " +
    "between batches changes the next batch's verdicts") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val table = mkDb("rc7")
    RobotsCache.rebuild(Seq(
        ("s.com", asOf - 2 * H, "User-agent: *\nDisallow: /private"))
        .toDF("host", "fetched_at_micros", "robots_body"),
      "host", "fetched_at_micros", "robots_body", table, nBuckets = 2)
    val seen = "graft_rc7db.seen"
    graft.streaming.EventStreams.initFrontierSeen(spark, seen,
      nBuckets = 2)
    val emitted =
      scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[String])]
    var batchNo = 0L
    val in = MemoryStream[(Long, String, String)]
    val q = graft.streaming.EventStreams.frontierStream(
        in.toDF().toDF("doc_id", "url", "html"),
        "doc_id", "url", "html", table, seen) { (sched, _) =>
      emitted.synchronized {
        emitted += ((batchNo,
          sched.select("link_canon").collect().map(_.getString(0))
            .sorted.toSeq))
        batchNo += 1
      }
    }
    try {
      in.addData((1L, "https://s.com/",
        "<a href=\"/private/a\">x</a><a href=\"/public/b\">y</a>"))
      q.processAllAvailable()
      // the refetch lands between batches: the origin dropped the
      // /private exclusion (allow-all body, rule-less)
      RobotsCache.refresh(Seq(
          ("s.com", asOf - 1 * H, "User-agent: *\nDisallow:"))
          .toDF("host", "fetched_at_micros", "robots_body"),
        "host", "fetched_at_micros", "robots_body", table)
      in.addData((2L, "https://s.com/p2",
        "<a href=\"/private/c\">x</a><a href=\"/public/d\">y</a>"))
      q.processAllAvailable()
      // the TIGHTENING direction (q197's trigger): a refetch that ADDS
      // an exclusion must evict matching URLs from the very next batch
      RobotsCache.refresh(Seq(
          ("s.com", asOf,
            "User-agent: *\nDisallow: /public"))
          .toDF("host", "fetched_at_micros", "robots_body"),
        "host", "fetched_at_micros", "robots_body", table)
      in.addData((3L, "https://s.com/p3",
        "<a href=\"/public/e\">x</a><a href=\"/open/f\">y</a>"))
      q.processAllAvailable()
    } finally q.stop()
    val byBatch = emitted.toMap
    // batch 1: the cached exclusion holds — /private/a never surfaces
    assert(byBatch(0L) == Seq("https://s.com/public/b"), byBatch)
    // batch 2: the refetched rules govern — /private/c now passes
    assert(byBatch(1L) ==
      Seq("https://s.com/private/c", "https://s.com/public/d"), byBatch)
    // batch 3: the tightened rules govern — /public/e is evicted
    assert(byBatch(2L) == Seq("https://s.com/open/f"), byBatch)
  }

  test("policyDelta: additions/removals/tightenings between the latest " +
    "two fetches; rule-less histories read unchanged; single-fetch " +
    "hosts emit nothing; a third fetch shifts the comparison window") {
    val table = mkDb("rc8")
    RobotsCache.rebuild(Seq(
        ("t.com", asOf - 40 * H, "User-agent: *\nDisallow: /a\nDisallow: /b"),
        ("l.com", asOf - 40 * H, "User-agent: *\nDisallow: /x"),
        ("e.com", asOf - 40 * H, "User-agent: *\nDisallow:"),
        ("once.com", asOf - 40 * H, "User-agent: *\nDisallow: /z"))
        .toDF("host", "fetched_at_micros", "robots_body"),
      "host", "fetched_at_micros", "robots_body", table, nBuckets = 2)
    RobotsCache.refresh(Seq(
        // tighten: drop /a, add disallows /c /d
        ("t.com", asOf - 2 * H,
          "User-agent: *\nDisallow: /b\nDisallow: /c\nDisallow: /d"),
        // loosen: same disallow + an Allow carve-out
        ("l.com", asOf - 2 * H,
          "User-agent: *\nDisallow: /x\nAllow: /x/ok"),
        // still rule-less: no change
        ("e.com", asOf - 2 * H, "User-agent: *\nDisallow:"))
        .toDF("host", "fetched_at_micros", "robots_body"),
      "host", "fetched_at_micros", "robots_body", table)
    def deltas(): Map[String, (Long, Long, Long, Boolean)] =
      RobotsCache.policyDelta(spark, table).collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
          r.getLong(3), r.getBoolean(4)))).toMap
    val d = deltas()
    assert(d("t.com") == ((2L, 1L, 2L, true)), d)
    assert(d("l.com") == ((1L, 0L, 0L, true)), d)
    assert(d("e.com") == ((0L, 0L, 0L, false)), d)
    assert(!d.contains("once.com"))
    // a THIRD fetch: the window slides — t.com reverts to bootstrap
    // policy, so vs its SECOND fetch that reads as /a re-added (1
    // added, a tightening) and /c /d dropped (2 removed)
    RobotsCache.refresh(Seq(
        ("t.com", asOf, "User-agent: *\nDisallow: /a\nDisallow: /b"))
        .toDF("host", "fetched_at_micros", "robots_body"),
      "host", "fetched_at_micros", "robots_body", table)
    assert(deltas()("t.com") == ((1L, 2L, 1L, true)), deltas())
    // REMOVING an Allow carve-out tightens too: l.com drops /x/ok
    // under its standing Disallow /x — previously-permitted URLs are
    // now forbidden, so n_tightened must fire (0 added, 1 removed)
    RobotsCache.refresh(Seq(
        ("l.com", asOf, "User-agent: *\nDisallow: /x"))
        .toDF("host", "fetched_at_micros", "robots_body"),
      "host", "fetched_at_micros", "robots_body", table)
    assert(deltas()("l.com") == ((0L, 1L, 1L, true)), deltas())
  }

  test("policyDelta removed-Allow coverage: dropping an Allow with NO " +
    "standing Disallow below it forbids nothing (default is allow — " +
    "not a tightening); a covered carve-out and a wildcard-covered one " +
    "both tighten") {
    val table = mkDb("rc8b")
    RobotsCache.rebuild(Seq(
        // free.com: Allow with no Disallow anywhere near it
        ("free.com", asOf - 40 * H,
          "User-agent: *\nAllow: /open\nDisallow: /private"),
        // wild.com: Allow carved out of a WILDCARD disallow
        ("wild.com", asOf - 40 * H,
          "User-agent: *\nDisallow: /d/*page$\nAllow: /d/1"))
        .toDF("host", "fetched_at_micros", "robots_body"),
      "host", "fetched_at_micros", "robots_body", table, nBuckets = 2)
    RobotsCache.refresh(Seq(
        // /open removed; /private still stands but does NOT cover
        // /open — nothing previously permitted became forbidden
        ("free.com", asOf, "User-agent: *\nDisallow: /private"),
        // /d/1 removed; the standing wildcard disallow conservatively
        // covers it (regex match set — the documented
        // over-approximation) — tightens
        ("wild.com", asOf, "User-agent: *\nDisallow: /d/*page$"))
        .toDF("host", "fetched_at_micros", "robots_body"),
      "host", "fetched_at_micros", "robots_body", table)
    val d = RobotsCache.policyDelta(spark, table).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4)))).toMap
    assert(d("free.com") == ((0L, 1L, 0L, true)), d)
    assert(d("wild.com") == ((0L, 1L, 1L, true)), d)
  }

  test("ttlGate: a budget that itself carries a fetched_at_micros " +
    "payload column survives the gate untouched (the cache's stamp " +
    "joins under a reserved alias)") {
    val table = mkDb("rc8c")
    RobotsCache.rebuild(Seq(
        ("a.com", asOf - 2 * H, "User-agent: *\nDisallow: /p"))
        .toDF("host", "fetched_at_micros", "robots_body"),
      "host", "fetched_at_micros", "robots_body", table, nBuckets = 2)
    val budget = Seq(("a.com", 7L, 999L), ("new.com", 3L, 888L))
      .toDF("host", "n_budgeted", "fetched_at_micros")
    val out = RobotsCache.ttlGate(spark, budget, "host", table, asOf)
      .collect().map(r => r.getAs[String]("host") ->
        ((r.getAs[Long]("n_budgeted"),
          r.getAs[Long]("fetched_at_micros"),
          r.getAs[String]("action")))).toMap
    assert(out("a.com") == ((7L, 999L, "proceed")), out)
    assert(out("new.com") == ((3L, 888L, "refetch_robots_first")), out)
  }

  test("fetch log is 1:1 with the batch: a batch carrying duplicate " +
    "(host, fetched_at) fetches logs one row per input row, never a " +
    "join-multiplied cross (the fsck still flags the replay)") {
    val table = mkDb("rc8d")
    RobotsCache.rebuild(Seq(
        ("s.com", asOf - 2 * H,
          "User-agent: *\nCrawl-delay: 2\nDisallow: /p"))
        .toDF("host", "fetched_at_micros", "robots_body"),
      "host", "fetched_at_micros", "robots_body", table, nBuckets = 2)
    // a retried foreachBatch re-append: the SAME (host, ts) twice in
    // one batch — the old parse-then-self-join multiplied these 2×2
    RobotsCache.refresh(Seq(
        ("s.com", asOf, "User-agent: *\nCrawl-delay: 4"),
        ("s.com", asOf, "User-agent: *\nCrawl-delay: 4"))
        .toDF("host", "fetched_at_micros", "robots_body"),
      "host", "fetched_at_micros", "robots_body", table)
    val logged = spark.table(s"${table}_fetches")
      .filter(col("fetched_at_micros") === asOf).collect()
    assert(logged.length == 2, logged.toSeq) // 1:1, not 4
    assert(logged.forall(_.getAs[Long]("crawl_delay_micros") == 4000000L))
    // the duplicate itself is still an ingest-contract violation the
    // audit reports (at-most-once per (host, ts) is the caller's job)
    assert(IndexAudit.auditRobotsCache(spark, table)
      .filter(!col("ok")).count() > 0)
  }

  test("a repeated rule line in a stored body is ONE logical rule: " +
    "latestRules and policyDelta count sets, and the fsck stays green " +
    "on legitimate duplicate-line input") {
    val table = mkDb("rc9")
    RobotsCache.rebuild(Seq(
        ("d.com", asOf - 30 * H,
          "User-agent: *\nDisallow: /a\nDisallow: /a\nDisallow: /b"))
        .toDF("host", "fetched_at_micros", "robots_body"),
      "host", "fetched_at_micros", "robots_body", table, nBuckets = 2)
    // one stored rule row per logical rule
    assert(RobotsCache.latestRules(spark, table)
      .select("path_prefix").collect().map(_.getString(0)).sorted.toSeq
      == Seq("/a", "/b"))
    // a healthy duplicate-line artifact must NOT read as corruption
    assert(IndexAudit.auditRobotsCache(spark, table)
      .filter(!col("ok")).count() == 0)
    // a refetch whose body ALSO repeats lines diffs logical rules:
    // /a dropped once (not twice), /c added once
    RobotsCache.refresh(Seq(
        ("d.com", asOf - 1 * H,
          "User-agent: *\nDisallow: /b\nDisallow: /c\nDisallow: /c"))
        .toDF("host", "fetched_at_micros", "robots_body"),
      "host", "fetched_at_micros", "robots_body", table)
    val d = RobotsCache.policyDelta(spark, table).head
    assert((d.getLong(1), d.getLong(2), d.getLong(3)) == ((1L, 1L, 1L)))
    assert(IndexAudit.auditRobotsCache(spark, table)
      .filter(!col("ok")).count() == 0)
  }

  test("compact keeps the last two fetches per host through a staged " +
    "swap: policyDelta and latestRules are bit-identical, older " +
    "history is gone, fsck green, no stage table left behind") {
    val table = mkDb("rc10")
    RobotsCache.rebuild(Seq(
        ("a.com", asOf - 80 * H, "User-agent: *\nDisallow: /v1"),
        ("b.com", asOf - 80 * H, "User-agent: *\nDisallow: /w1"))
        .toDF("host", "fetched_at_micros", "robots_body"),
      "host", "fetched_at_micros", "robots_body", table, nBuckets = 2)
    // three more cycles for a.com, one more for b.com
    Seq(60L, 40L, 2L).foreach { h =>
      RobotsCache.refresh(Seq(
          ("a.com", asOf - h * H, s"User-agent: *\nDisallow: /v$h"))
          .toDF("host", "fetched_at_micros", "robots_body"),
        "host", "fetched_at_micros", "robots_body", table)
    }
    RobotsCache.refresh(Seq(
        ("b.com", asOf - 3 * H, "User-agent: *\nDisallow: /w2"))
        .toDF("host", "fetched_at_micros", "robots_body"),
      "host", "fetched_at_micros", "robots_body", table)
    def snap() = (
      RobotsCache.policyDelta(spark, table).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getBoolean(4))).sortBy(_._1).toSeq,
      RobotsCache.latestRules(spark, table).collect()
        .map(r => (r.getString(0), r.getString(1))).sortBy(_.toString)
        .toSeq,
      RobotsCache.ages(spark, table, asOf).collect()
        .map(r => (r.getString(0),
          r.getLong(r.fieldIndex("robots_age_hours")))).sortBy(_._1)
        .toSeq)
    val before = snap()
    RobotsCache.compact(spark, table)
    assert(snap() == before)
    // history truncated to the policyDelta window: 2 fetches per host
    val perHost = spark.table(s"${table}_fetches")
      .groupBy(col("host")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perHost == Map("a.com" -> 2L, "b.com" -> 2L), perHost)
    // the superseded fetches' rules are gone with their log rows
    // (b.com has only two fetches, so /w1 is still in-window and stays)
    assert(spark.table(table)
      .filter(col("path_prefix").isin("/v1", "/v60"))
      .count() == 0)
    assert(spark.table(table)
      .filter(col("path_prefix") === "/w1").count() == 1)
    assert(IndexAudit.auditRobotsCache(spark, table)
      .filter(!col("ok")).count() == 0)
    assert(!spark.catalog.tableExists(s"${table}__compact"))
    assert(!spark.catalog.tableExists(s"${table}_fetches__compact"))
  }

  test("crawl-delay lives in the fetch log: latestDelays serves " +
    "strictly the newest fetch's winner, a delay-less refetch reverts " +
    "the host to the default, and compaction preserves the stored " +
    "delays") {
    val table = mkDb("rc11")
    RobotsCache.rebuild(Seq(
        // star delay + a graftbot-specific group that must win
        ("sp.com", asOf - 40 * H,
          "User-agent: *\nCrawl-delay: 5\nDisallow: /x\n\n" +
            "User-agent: graftbot\nCrawl-delay: 0.5\nDisallow: /y"),
        ("plain.com", asOf - 40 * H,
          "User-agent: *\nCrawl-delay: 2\nDisallow: /x"),
        ("none.com", asOf - 40 * H, "User-agent: *\nDisallow: /x"))
        .toDF("host", "fetched_at_micros", "robots_body"),
      "host", "fetched_at_micros", "robots_body", table,
      agent = "graftbot", nBuckets = 2)
    def delays(): Map[String, Long] =
      RobotsCache.latestDelays(spark, table).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(delays() == Map("sp.com" -> 500000L, "plain.com" -> 2000000L))
    // plain.com refetches SLOWER; sp.com's refetch drops the delay
    // line entirely — strictly latest-wins, no fallback to the
    // superseded fetch's policy
    RobotsCache.refresh(Seq(
        ("plain.com", asOf - 2 * H,
          "User-agent: *\nCrawl-delay: 10\nDisallow: /x"),
        ("sp.com", asOf - 2 * H, "User-agent: *\nDisallow: /x"))
        .toDF("host", "fetched_at_micros", "robots_body"),
      "host", "fetched_at_micros", "robots_body", table,
      agent = "graftbot")
    assert(delays() == Map("plain.com" -> 10000000L))
    // the schedule consumes the cache: plain.com slots spread 10 s,
    // sp.com and unknown hosts ride the default
    val frontier = Seq(("plain.com", 1L), ("plain.com", 2L),
      ("sp.com", 1L), ("sp.com", 2L), ("new.com", 1L), ("new.com", 2L))
      .toDF("link_host", "rank")
    val slots = UrlOps.politenessSchedule(frontier, "link_host", "rank",
        RobotsCache.latestDelays(spark, table),
        defaultDelayMicros = 1000000L)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        r.getLong(r.fieldIndex("fetch_at_micros"))).toMap
    assert(slots(("plain.com", 2L)) == 10000000L)
    assert(slots(("sp.com", 2L)) == 1000000L)
    assert(slots(("new.com", 2L)) == 1000000L)
    // keep-2 compaction: the delay column survives the staged rewrite
    RobotsCache.compact(spark, table)
    assert(delays() == Map("plain.com" -> 10000000L))
    assert(IndexAudit.auditRobotsCache(spark, table)
      .filter(!col("ok")).count() == 0)
  }

  test("robotsFetchStream with compactEvery: the cadence maintenance " +
    "runs inside the loop — history stays bounded while reads between " +
    "batches are unaffected") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val table = mkDb("rc12")
    RobotsCache.rebuild(Seq(
        ("c.com", asOf - 90 * H, "User-agent: *\nDisallow: /g1"))
        .toDF("host", "fetched_at_micros", "robots_body"),
      "host", "fetched_at_micros", "robots_body", table, nBuckets = 2)
    val in = MemoryStream[(String, Long, String)]
    val q = graft.streaming.EventStreams.robotsFetchStream(
      in.toDF().toDF("host", "fetched_at_micros", "robots_body"),
      "host", "fetched_at_micros", "robots_body", table,
      compactEvery = 2)
    try {
      in.addData(("c.com", asOf - 60 * H, "User-agent: *\nDisallow: /g2"))
      q.processAllAvailable()
      // batch 1 (no compaction yet): 2 fetches
      assert(spark.table(s"${table}_fetches").count() == 2)
      in.addData(("c.com", asOf - 30 * H, "User-agent: *\nDisallow: /g3"))
      q.processAllAvailable() // batch 2 → compact: keep g2, g3
      // the compaction rewrote the table's files: this session's raw
      // read needs a fresh listing (the cache's own readers —
      // latestFetches/policyDelta — refresh internally)
      spark.catalog.refreshTable(s"${table}_fetches")
      spark.catalog.refreshTable(table)
      assert(spark.table(s"${table}_fetches").count() == 2)
      val d = RobotsCache.policyDelta(spark, table).head
      assert((d.getLong(1), d.getLong(2)) == ((1L, 1L))) // g3 vs g2
      val live = RobotsCache.latestRules(spark, table)
        .select("path_prefix").collect().map(_.getString(0)).toSeq
      assert(live == Seq("/g3"))
    } finally q.stop()
    assert(IndexAudit.auditRobotsCache(spark, table)
      .filter(!col("ok")).count() == 0)
  }

  test("the cache feeds robotsVerdict in its expected shape: latest " +
    "rules gate a URL batch exactly like an in-plan parse would") {
    val table = mkDb("rc6")
    RobotsCache.rebuild(Seq(
        ("a.com", asOf - 1 * H,
          "User-agent: *\nDisallow: /private\nAllow: /private/ok"))
        .toDF("host", "fetched_at_micros", "robots_body"),
      "host", "fetched_at_micros", "robots_body", table, nBuckets = 2)
    val urls = Seq(
      (1L, "https://a.com/private/x"),
      (2L, "https://a.com/private/ok"),
      (3L, "https://a.com/public"),
      (4L, "https://unknown.com/anything"))
      .toDF("doc_id", "url_canon")
    val got = UrlOps.robotsVerdict(urls, "doc_id", "url_canon",
        RobotsCache.latestRules(spark, table))
      .select("doc_id", "fetch_allowed")
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toMap
    assert(got == Map(1L -> false, 2L -> true, 3L -> true, 4L -> true))
  }
}
