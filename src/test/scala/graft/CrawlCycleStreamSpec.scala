package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The crawl cycle lifted to the micro-batch cadence
  * ([[graft.streaming.CrawlCycleStream]]): two cycles streamed —
  * with an in-loop compaction after EVERY cycle and a checkpointed
  * restart between them — must reproduce q198's one-plan batch
  * fixpoint bit-for-bit over the same collapsed schedule and the same
  * persisted-artifact kinds (robots cache, revisit log, gates). The
  * ReleasePipelineSpec discipline: incremental operation changes
  * operational shape, never results.
  */
class CrawlCycleStreamSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private val Hour = 3600000000L

  test("2-cycle stream ≡ q198's batch relation bit-for-bit; compaction " +
    "fires mid-loop; restart-safety via the checkpointLocation path") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    graft.plans.GraftFunctions.register(spark)
    val asOf = graft.entry.TextQueries.Q178AsOfMicros

    // the batch capstone — the relation the stream must reproduce
    val expected = SparkEntry.queries("q198_crawl_cycle2")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(expected.nonEmpty)

    // the stream's OWN artifacts, seeded exactly like q198's legs 1-3
    val loc = java.nio.file.Files.createTempDirectory("graft_ccs").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_ccsdb LOCATION '$loc'")
    val rtable = "graft_ccsdb.robots"
    val ltable = "graft_ccsdb.revlog"
    val gtable = "graft_ccsdb.gates"
    val fr = graft.entry.TextQueries.q198CollapsedFrontier(spark, sfDir)
      .localCheckpoint()
    val budget = fr.groupBy(col("link_host"))
      .agg(count(lit(1)).as("n_budgeted"))
    val digit = regexp_extract(col("link_host"),
      "([0-9])\\.example\\.", 1)
    val ageHours = lit(5L) +
      coalesce(nullif(digit, lit("")), lit("0")).cast("long") * 5L
    graft.ext.RobotsCache.rebuild(
      budget.select(col("link_host").as("host"),
        (lit(asOf) - ageHours * Hour).as("fetched_at_micros"),
        lit("User-agent: *\nDisallow: /private").as("robots_body")),
      "host", "fetched_at_micros", "robots_body", rtable, nBuckets = 8)
    val len = length(col("url_canon")).cast("long")
    graft.streaming.RevisitStream.initLog(
      fr.filter(len % 3 === 0)
        .select(col("url_canon"),
          concat(lit("stale content of "), col("url_canon")).as("body"),
          lit("2026-01-01").as("first_fetched"),
          lit("2026-01-15").as("last_validated"),
          (len % 6 =!= 0).as("is_active")),
      "url_canon", "body", ltable, nBuckets = 8)

    // q192/q198's deterministic fetch classes, per cycle
    def statusFor(sch: DataFrame, cid: Long): DataFrame = {
      val l = length(col("url_canon")).cast("long")
      val st =
        if (cid == 1L)
          when(l % 3 === 0 && l % 7 === 2, 304L).when(l % 7 === 0, 404L)
            .when(l % 7 === 1, 503L).otherwise(200L)
        else
          when(l % 5 === 0, 304L).when(l % 5 === 1, 404L)
            .when(l % 5 === 2, 503L).otherwise(200L)
      val prefix =
        if (cid == 1L) "cycle one fetch of " else "cycle two fetch of "
      sch.select(col("url_canon"), st.as("http_status"))
        .withColumn("http_body", when(col("http_status") === 200L,
          concat(lit(prefix), col("url_canon"))))
    }
    def nowFor(cid: Long) =
      if (cid == 1L) lit("2026-02-10") else lit("2026-02-17")

    val cycles = MemoryStream[(Long, Long)]
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ccs_ck")
      .toString
    def startLoop() = graft.streaming.CrawlCycleStream.start(
      cycles.toDF().toDF("cycle_id", "as_of_micros"), fr, rtable,
      ltable, gtable, lit("User-agent: *\nDisallow: /private"),
      statusFor, nowFor, compactEvery = 1,
      checkpointLocation = Some(ckpt))

    // cycle 1, then STOP — the compaction cadence (compactEvery = 1)
    // fires inside the loop, folding the log to seq 0
    cycles.addData((1L, asOf))
    val q1 = startLoop()
    try q1.processAllAvailable() finally q1.stop()
    spark.catalog.refreshTable(ltable)
    assert(spark.table(ltable)
      .agg(max(col("__seq"))).head.getLong(0) == 0L,
      "mid-loop compaction did not fold the log")

    // RESTART from the checkpoint: the committed cycle must not
    // re-fire; only cycle 2 processes
    cycles.addData((2L, asOf + Hour))
    val q2 = startLoop()
    try q2.processAllAvailable() finally q2.stop()

    // assemble the q198 relation from the stream's artifacts alone
    val gates = graft.streaming.CrawlCycleStream.gates(spark, gtable)
    val g1 = gates.filter(col("cycle_id") === 1L)
      .select(col("link_host"), col("action").as("action_c1"))
    val g2 = gates.filter(col("cycle_id") === 2L)
      .select(col("link_host"), col("action").as("action_c2"))
    val st2 = when(len % 5 === 0, 304L).when(len % 5 === 1, 404L)
      .when(len % 5 === 2, 503L).otherwise(200L)
    val state = graft.streaming.RevisitStream.logState(spark, ltable,
      "url_canon", "body")
    val got = fr.join(g1, Seq("link_host")).join(g2, Seq("link_host"))
      .withColumn("sim_status_c2", st2)
      .join(state.select(col("url_canon"), col("is_active"),
        md5(col("body")).as("body_md5"), col("first_fetched"),
        col("last_validated")), Seq("url_canon"), "left")
      .select(col("link_host"), col("rank"), col("url_canon"),
        col("action_c1"), col("action_c2"), col("sim_status_c2"),
        col("is_active"), col("body_md5"), col("first_fetched"),
        col("last_validated"))
      .orderBy("link_host", "rank")
      .collect().map(_.toSeq).toSeq
    assert(got == expected,
      s"stream/batch divergence: got ${got.take(3)} vs " +
        s"${expected.take(3)}")

    // both cycles' gate actions were recorded exactly once each
    assert(gates.groupBy(col("cycle_id")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap.keySet == Set(1L, 2L))
  }

  test("artifact-consuming loop (the q204 consumption): a mirror-" +
    "duplicate host spends NOTHING — gate records mirror_duplicate, " +
    "no robots refetch, no log rows — authority lands in cycle " +
    "history, and the surviving slice is bit-identical to the " +
    "default loop over the pre-collapsed frontier") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val asOf = graft.entry.TextQueries.Q178AsOfMicros
    val loc = java.nio.file.Files.createTempDirectory("graft_cca").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_ccadb LOCATION '$loc'")

    // artifacts: b.com mirrors a.com; authority covers a/b, not c
    val edges = Seq(("a.com", "b.com")).toDF("src", "dst")
    val nodes = edges.select(col("src").as("host"))
      .union(edges.select(col("dst").as("host"))).distinct()
    graft.ext.Graph.writeComponents(
      graft.ext.Graph.connectedComponents(nodes, "host", edges,
        "src", "dst"),
      "id", "graft_ccadb.comp", nBuckets = 2)
    graft.ext.Graph.writePageRank(
      graft.ext.Graph.pageRankMicro(nodes, edges, "host", "src", "dst",
        nNodes = 2, iters = 3),
      "host", "graft_ccadb.pr", iters = 3, nNodes = 2, nBuckets = 2)

    val frFull = Seq(("a.com", 1L, "https://a.com/x"),
      ("a.com", 2L, "https://a.com/y"),
      ("b.com", 1L, "https://b.com/x"),
      ("c.com", 1L, "https://c.com/x"))
      .toDF("link_host", "rank", "url_canon").localCheckpoint()
    val frCollapsed = frFull.filter(col("link_host") =!= "b.com")
      .localCheckpoint()

    // a fresh (proceeds), b and c stale (b's refetch must NOT happen —
    // the dup eviction outranks the TTL gate)
    def seedRobots(rt: String, fr: DataFrame): Unit =
      graft.ext.RobotsCache.rebuild(
        fr.select(col("link_host")).distinct()
          .select(col("link_host").as("host"),
            (lit(asOf) - when(col("link_host") === "a.com", 1L * Hour)
              .otherwise(30L * Hour)).as("fetched_at_micros"),
            lit("User-agent: *\nDisallow: /private").as("robots_body")),
        "host", "fetched_at_micros", "robots_body", rt, nBuckets = 2)
    def seedLog(lt: String): Unit =
      graft.streaming.RevisitStream.initLog(
        Seq(("https://a.com/x", "old body of x", "2026-01-01",
          "2026-01-15", true))
          .toDF("url_canon", "body", "first_fetched", "last_validated",
            "is_active"),
        "url_canon", "body", lt, nBuckets = 2)
    def statusFor(sch: DataFrame, cid: Long): DataFrame =
      sch.select(col("url_canon"), lit(200L).as("http_status"))
        .withColumn("http_body",
          concat(lit(s"cycle $cid fetch of "), col("url_canon")))
    def nowFor(cid: Long) =
      if (cid == 1L) lit("2026-02-10") else lit("2026-02-17")

    def run(fr: DataFrame, rt: String, lt: String, gt: String,
            comp: Option[String], pr: Option[String]): Unit = {
      seedRobots(rt, fr); seedLog(lt)
      val cycles = MemoryStream[(Long, Long)]
      val q = graft.streaming.CrawlCycleStream.start(
        cycles.toDF().toDF("cycle_id", "as_of_micros"), fr, rt, lt, gt,
        lit("User-agent: *\nDisallow: /private"), statusFor, nowFor,
        compTable = comp, prTable = pr)
      try {
        cycles.addData((1L, asOf)); q.processAllAvailable()
        cycles.addData((2L, asOf + Hour)); q.processAllAvailable()
      } finally q.stop()
    }
    run(frFull, "graft_ccadb.ra", "graft_ccadb.la", "graft_ccadb.ga",
      Some("graft_ccadb.comp"), Some("graft_ccadb.pr"))
    run(frCollapsed, "graft_ccadb.rb", "graft_ccadb.lb",
      "graft_ccadb.gb", None, None)

    val ga = graft.streaming.CrawlCycleStream.gates(spark,
      "graft_ccadb.ga")
    // the duplicate is evicted by the gate, BOTH cycles, and its
    // stored authority still lands in the history row
    val bRows = ga.filter(col("link_host") === "b.com")
      .select(col("cycle_id"), col("action"), col("authority_micro"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    val bAuth = graft.ext.Graph.loadPageRank(spark, "graft_ccadb.pr")
      .filter(col("host") === "b.com").head.getLong(1)
    assert(bRows == Set((1L, "mirror_duplicate", bAuth),
      (2L, "mirror_duplicate", bAuth)), bRows)
    // uncovered c records authority 0 — the q203 drift signal in-history
    assert(ga.filter(col("link_host") === "c.com")
      .select(col("authority_micro")).collect().map(_.getLong(0))
      .forall(_ == 0L))
    // no budget spent on b: no log rows, no robots refetch appended
    spark.catalog.refreshTable("graft_ccadb.la")
    assert(spark.table("graft_ccadb.la")
      .filter(col("url_canon").contains("b.com")).count() == 0L)
    spark.catalog.refreshTable(s"graft_ccadb.ra_fetches")
    assert(spark.table("graft_ccadb.ra_fetches")
      .filter(col("host") === "b.com").count() == 1L,
      "the dup host's stale robots must NOT refetch")
    // the surviving slice is bit-identical to the default loop over
    // the pre-collapsed frontier: same log state, same gate actions
    def state(lt: String) = graft.streaming.RevisitStream
      .logState(spark, lt, "url_canon", "body")
      .collect().map(_.toSeq).toSet
    assert(state("graft_ccadb.la") == state("graft_ccadb.lb"))
    val gaActs = ga.filter(col("link_host") =!= "b.com")
      .select(col("cycle_id"), col("link_host"), col("action"))
      .collect().map(_.toSeq).toSet
    val gbActs = graft.streaming.CrawlCycleStream.gates(spark,
        "graft_ccadb.gb")
      .select(col("cycle_id"), col("link_host"), col("action"))
      .collect().map(_.toSeq).toSet
    assert(gaActs == gbActs)
  }

  test("mirrorIngestStream: per-batch appends keep the hash relation " +
    "at the union's distinct, drift stays clean until the batch that " +
    "introduces a new mirror member, and the q201 rebuild clears it") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    graft.plans.GraftFunctions.register(spark)
    val loc = java.nio.file.Files.createTempDirectory("graft_mis").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_misdb LOCATION '$loc'")
    val ht = "graft_misdb.hashes"
    val ct = "graft_misdb.comp"
    val c1 = Seq(
      ("A", "page one"), ("A", "page two"),
      ("B", "page one"), ("B", "page two"),
      ("C", "c only"))
      .toDF("host", "text")
    graft.ext.Dedup.writeMirrorHashes(c1, "host", "text", ht,
      nBuckets = 2)
    val pairs1 = graft.ext.Dedup.mirrorPairsFromIndex(spark, ht,
      minShared = 2L, maxHostsPerHash = 4)
    val nodes1 = pairs1.select(col("host_a").as("host"))
      .union(pairs1.select(col("host_b").as("host"))).distinct()
    graft.ext.Graph.writeComponents(
      graft.ext.Graph.connectedComponents(nodes1, "host", pairs1,
        "host_a", "host_b"),
      "id", ct, nBuckets = 2)

    val drifts = scala.collection.mutable.Map.empty[Long, Long]
    val mem = MemoryStream[(String, String)]
    val stream = graft.streaming.CrawlCycleStream.mirrorIngestStream(
      mem.toDF().toDF("host", "text"), "host", "text", ht, ct,
      minShared = 2L, maxHostsPerHash = 4) { (report, batchId) =>
      drifts(batchId) = report.filter(!col("ok"))
        .agg(coalesce(sum(col("observed")), lit(0L))).head.getLong(0)
    }
    try {
      mem.addData(("C", "c other")) // still unique content: no drift
      stream.processAllAvailable()
      mem.addData(("C", "page one"), ("C", "page two"), // C mirrors now
        ("A", "page one")) // replayed duplicate: must add nothing
      stream.processAllAvailable()
    } finally stream.stop()
    assert(drifts(0L) == 0L, drifts)
    assert(drifts(1L) == 1L, drifts) // C uncovered — the rebuild trigger
    // store == union's distinct (the duplicate added no row)
    val expected = c1.union(Seq(("C", "c other"), ("C", "page one"),
        ("C", "page two"), ("A", "page one")).toDF("host", "text"))
      .select(col("host"), md5(col("text")).as("content_md5")).distinct()
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // the stream's session CLONE did the appends — re-list here
    spark.catalog.refreshTable(ht)
    assert(spark.table(ht).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet == expected)
    // the trigger consumed: rebuild over the updated universe clears it
    val pairs2 = graft.ext.Dedup.mirrorPairsFromIndex(spark, ht,
      minShared = 2L, maxHostsPerHash = 4)
    val nodes2 = pairs2.select(col("host_a").as("host"))
      .union(pairs2.select(col("host_b").as("host"))).distinct()
    graft.ext.Graph.rebuildComponents(spark, ct, nodes2, "host",
      pairs2, "host_a", "host_b")
    assert(graft.ext.IndexAudit.driftComponents(spark, ct, nodes2,
      "host").filter(!col("ok")).count() == 0)
  }

  test("linkIngestStream: per-batch appends keep the link relation " +
    "at the union's distinct, drift stays clean until the batch that " +
    "introduces a new host, and the q203 rebuild from the store " +
    "clears it") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val loc = java.nio.file.Files.createTempDirectory("graft_lis").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_lisdb LOCATION '$loc'")
    val lt = "graft_lisdb.links"
    val pt = "graft_lisdb.pr"
    val e1 = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("src", "dst")
    graft.ext.Graph.writeHostLinks(e1, "src", "dst", lt, nBuckets = 2)
    val stored1 = graft.ext.Graph.loadHostLinks(spark, lt)
    val nodes1 = stored1.select(col("src").as("host"))
      .union(stored1.select(col("dst").as("host"))).distinct()
    graft.ext.Graph.writePageRank(
      graft.ext.Graph.pageRankMicro(nodes1, stored1, "host",
        "src", "dst", nNodes = 3, iters = 5),
      "host", pt, iters = 5, nNodes = 3, nBuckets = 2)

    val drifts = scala.collection.mutable.Map.empty[Long, Long]
    val mem = MemoryStream[(String, String)]
    val stream = graft.streaming.CrawlCycleStream.linkIngestStream(
      mem.toDF().toDF("src", "dst"), "src", "dst", lt, pt) {
      (report, batchId) =>
        drifts(batchId) = report.filter(!col("ok"))
          .agg(coalesce(sum(col("observed")), lit(0L))).head.getLong(0)
    }
    try {
      mem.addData(("a", "c")) // known hosts: no drift
      stream.processAllAvailable()
      mem.addData(("a", "hub"), ("b", "hub"), // hub is new
        ("a", "b"), ("a", "a")) // replayed dup + self-loop: no rows
      stream.processAllAvailable()
    } finally stream.stop()
    assert(drifts(0L) == 0L, drifts)
    assert(drifts(1L) == 1L, drifts) // hub uncovered — the trigger
    // store == union's distinct (dup and self-loop added nothing)
    spark.catalog.refreshTable(lt)
    assert(spark.table(lt).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet ==
      Set(("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"),
        ("a", "hub"), ("b", "hub")))
    // the trigger consumed: rebuild FROM THE STORE clears the drift,
    // and the stored ranks match a fresh train over the union
    val stored2 = graft.ext.Graph.loadHostLinks(spark, lt)
    val nodes2 = stored2.select(col("src").as("host"))
      .union(stored2.select(col("dst").as("host"))).distinct()
    graft.ext.Graph.rebuildPageRank(spark, pt, nodes2, "host",
      stored2, "src", "dst")
    assert(graft.ext.IndexAudit.driftPageRank(spark, pt, nodes2,
      "host").filter(!col("ok")).count() == 0)
    val fresh = graft.ext.Graph.pageRankMicro(nodes2, stored2, "host",
        "src", "dst", nNodes = 4, iters = 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(graft.ext.Graph.loadPageRank(spark, pt)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet == fresh)
  }
}
