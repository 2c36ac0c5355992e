package graft

import graft.ext.TextOps
import org.apache.spark.sql.functions._

/** The q149 capstone's cross-stage dependency, shown non-circularly:
  * the planted duplicate group (every fifth page, even members
  * double-encoded) collapses to ONE canonical only because the
  * mojibake repair runs BEFORE the dedup — skipping the repair leaves
  * the damaged and clean members byte-distinct and the group splits.
  */
class CrawlFunnelSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("with repair, the dup group collapses to one canonical") {
    val rows = SparkEntry.queries("q149_crawl_funnel")(spark, dir)
      .filter(col("doc_id") % 5 === 0).collect()
    assert(rows.length >= 4)
    assert(rows.map(_.getString(5)).distinct.length == 1,
      "all dup-group members must share one repaired hash")
    assert(rows.count(_.getBoolean(4)) == 1,
      "exactly one canonical in the dup group")
  }

  test("without repair, the same group stays split by encoding damage") {
    import graft.entry.TextQueries._
    val based = spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("text0",
        when(col("doc_id") % 5 === 0, lit(CrawlDupText))
          .otherwise(col("text")))
    val aug = based.withColumn("html", concat(
      lit(HtmlPre), col("text0"),
      when(col("doc_id") % 2 === 0, lit(" " + MojibakeDamaged))
        .otherwise(lit(" " + MojibakeClean)),
      lit(HtmlLinks), lit(HtmlTail)))
    val hashes = TextOps.extractMainContent(aug, "html")
      .filter(col("doc_id") % 5 === 0)
      .select(md5(col("text_main"))).distinct().count()
    assert(hashes == 2,
      s"unrepaired group must split into damaged + clean hashes, got $hashes")
  }

  test("streaming crawl ingest: union of 2 micro-batches == one batch " +
    "pass (stateless per-document stages are pure)") {
    import graft.entry.TextQueries._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def page(id: Long, body: String): (Long, String) =
      (id, HtmlPre + body +
        (if (id % 2 == 0) " " + MojibakeDamaged else " " + MojibakeClean) +
        HtmlLinks + HtmlTail)
    val pages = (0L until 6L).map(i =>
      page(i, if (i % 5 == 0) CrawlDupText
        else s"it is the body of the streamed page number $i and it " +
          "has plenty of the usual words to pass the block filters."))
    val in = MemoryStream[(Long, String)]
    val acc = scala.collection.mutable.ArrayBuffer.empty[Seq[Any]]
    val query = graft.streaming.EventStreams.crawlIngestStream(
        in.toDF().toDF("doc_id", "html"), "doc_id", "html") { (batch, _) =>
      acc.synchronized {
        acc ++= batch.select("doc_id", "blocks_kept", "chars_collapsed",
          "text_main_fixed", "kept").collect().map(_.toSeq)
      }
    }
    in.addData(pages.take(2): _*)
    query.processAllAvailable()
    in.addData(pages.drop(2): _*)
    query.processAllAvailable()
    query.stop()
    val oneShot = {
      val df = pages.toDF("doc_id", "html")
      val ex = TextOps.extractMainContent(df, "html")
        .select(col("doc_id"), col("blocks_kept"), col("text_main"))
      val rep = TextOps.repairMojibake(ex, "text_main")
      graft.ext.QualityModel.qualityClassifierScore(rep, "text_main_fixed")
        .select("doc_id", "blocks_kept", "chars_collapsed",
          "text_main_fixed", "kept")
        .collect().map(_.toSeq)
    }
    assert(acc.sortBy(_.head.toString.toLong) ==
      oneShot.toSeq.sortBy(_.head.toString.toLong))
    assert(acc.nonEmpty)
  }

  test("crawlCorpusStream: two micro-batches with cross-batch duplicates " +
    "accumulate exactly the one-shot q149 canonical set; only the batch " +
    "shuffles") {
    import graft.entry.TextQueries._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def page(id: Long): (Long, String) =
      (id, HtmlPre +
        (if (id % 5 == 0) CrawlDupText
         else s"it is the body of the streamed page number $id and it " +
           "has plenty of the usual words to pass the block filters.") +
        (if (id % 2 == 0) " " + MojibakeDamaged else " " + MojibakeClean) +
        HtmlLinks + HtmlTail)
    // ids 0 and 5 carry the SAME duplicate content and land in DIFFERENT
    // batches — the cross-batch case the corpus anti-join exists for;
    // 2/7 are an intra-batch near-pair check (distinct content, both kept)
    val pages = (0L until 10L).map(page)
    val loc = java.nio.file.Files.createTempDirectory("graft_crawlc").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_ccdb LOCATION '$loc'")
    val table = "graft_ccdb.crawl_corpus"
    graft.streaming.EventStreams.initCrawlCorpus(spark, "doc_id", table,
      nBuckets = 4)
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          d: Long): Unit = plans.add(qe.executedPlan.toString)
      override def onFailure(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val in = MemoryStream[(Long, String)]
      val query = graft.streaming.EventStreams.crawlCorpusStream(
        in.toDF().toDF("doc_id", "html"), "doc_id", "html", table)
      in.addData(pages.take(5): _*)
      query.processAllAvailable()
      in.addData(pages.drop(5): _*)
      query.processAllAvailable()
      query.stop()
      // one-shot truth: the q149 funnel + canonical tail over ALL pages
      val ex = graft.ext.TextOps.extractMainContent(
          pages.toDF("doc_id", "html"), "html")
        .select(col("doc_id"), col("blocks_kept"), col("text_main"))
      val rep = graft.ext.TextOps.repairMojibake(ex, "text_main")
      val scored = graft.ext.QualityModel
        .qualityClassifierScore(rep, "text_main_fixed")
      val oneShot = graft.entry.TextQueries.crawlCanonicalTail(scored)
        .filter(col("is_canonical"))
        .select(col("doc_id"), col("fixed_md5"))
        .as[(Long, String)].collect().toSet
      assert(oneShot.nonEmpty)
      val accumulated = spark.table(table)
        .select(col("doc_id"), md5(col("text_main_fixed")))
        .as[(Long, String)].collect().toSet
      assert(accumulated == oneShot,
        s"corpus ${accumulated.toSeq.sorted} != one-shot canonical " +
          s"${oneShot.toSeq.sorted}")
      // the cross-batch duplicate kept its FIRST arrival only
      assert(accumulated.count(_._1 % 5 == 0) == 1)
      // plan pin: each batch's corpus append consumed the bucketed scan
      // (corpus never exchanged) and picked winners with an aggregate,
      // not a content-keyed window — the dedupAgainstCorpus contract
      import scala.jdk.CollectionConverters._
      val appends = plans.asScala.filter(p =>
        p.contains("crawl_corpus") && p.contains("InsertInto")).toSeq
      assert(appends.size == 2, s"expected 2 corpus appends, " +
        s"saw ${appends.size}")
      appends.foreach { p =>
        assert(p.contains("Bucketed: true"),
          s"corpus anti-join side not bucket-fed:\n$p")
        assert(!p.contains("Window"),
          s"a window crept into the per-batch pick:\n$p")
      }
    } finally {
      spark.listenerManager.unregister(listener)
      spark.sql("DROP DATABASE IF EXISTS graft_ccdb CASCADE")
    }
  }

  test("every even document repairs exactly the planted damage") {
    val rows = SparkEntry.queries("q149_crawl_funnel")(spark, dir)
      .filter(col("doc_id") % 2 === 0)
      .select(col("chars_collapsed")).collect()
    val expected = graft.entry.TextQueries.MojibakeDamaged.length -
      graft.entry.TextQueries.MojibakeClean.length
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(0) == expected.toLong))
  }

  test("q159 round trip holds through the BINARY gzip tier: " +
    "gzip-membered archives -> parse -> funnel ≡ q149") {
    import graft.entry.TextQueries
    import spark.implicits._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    // the exact q159 archives, gzipped one member per archive (the
    // single-member variant; WarcIngestSpec covers per-record members)
    val archives = TextQueries.plantedWarc(docs,
        org.apache.spark.sql.functions.concat(
          org.apache.spark.sql.functions.lit(TextQueries.HttpHdr),
          TextQueries.q149PageHtml))
      .select("doc_id", "txt").as[(Long, String)].collect()
    val gzipped = archives.map { case (id, txt) =>
      val bo = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(bo)
      gz.write(txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      gz.close()
      (id, bo.toByteArray)
    }.toSeq
    val parsed = graft.io.WarcIngest.parseWarcRecordsGz(
      gzipped.toDF("doc_id", "bin"), "doc_id", "bin")
    val pages = parsed
      .filter(col("warc_type") === "response" && col("length_matches"))
      .select(col("doc_id"), org.apache.spark.sql.functions.element_at(
        org.apache.spark.sql.functions.split(col("payload"), "\r\n\r\n"), 2)
        .as("html"))
    val viaGz = TextQueries.funnelFromPages(pages).orderBy("doc_id")
      .collect().map(_.toSeq).toSeq
    val direct = SparkEntry.queries("q149_crawl_funnel")(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(direct.nonEmpty && viaGz === direct)
  }

  test("q159 WARC round trip equals q149 bit-for-bit") {
    // archive framing must add nothing and lose nothing: parsing the
    // planted archives and running the funnel over the recovered HTTP
    // bodies gives exactly the direct funnel's output
    val direct = SparkEntry.queries("q149_crawl_funnel")(spark, dir)
      .collect().map(_.toSeq).toSeq
    val viaWarc = SparkEntry.queries("q159_warc_funnel")(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(direct.nonEmpty && viaWarc === direct)
  }

  test("the crawl loop closes: frontierStream discoveries → per-cycle " +
    "budget → cross-batch politeness slots, cycle 2 strictly after " +
    "cycle 1 per host") {
    import graft.entry.TextQueries
    import graft.ext.UrlOps
    import graft.streaming.{FetchSlot, FrontierCandidate, PolitenessStream}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = (0L until 20L)
      .map(i => (i, s"body of page $i", "src" + (i % 5)))
      .toDF("doc_id", "text", "source")
    val rules = TextQueries.plantedRobotsRules(docs)
    val pages = TextQueries.withPlantedPage(UrlOps.withCanonicalUrl(
        TextQueries.withPlantedUrl(docs), "url"))
      .select("doc_id", "url", "html")
      .as[(Long, String, String)].collect().sortBy(_._1).toSeq
    val loc = java.nio.file.Files.createTempDirectory("graft_loop").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_lpdb LOCATION '$loc'")
    val table = "graft_lpdb.loop_seen"
    graft.streaming.EventStreams.initFrontierSeen(spark, table, nBuckets = 4)
    // the scheduling tier: politeness slots with CROSS-BATCH state
    val slotsIn = MemoryStream[FrontierCandidate]
    val slotsQ = PolitenessStream.slots(slotsIn.toDS())
      .writeStream.format("memory").queryName("loop_slots")
      .outputMode("append").start()
    val cycleOf = scala.collection.mutable.Map.empty[String, Int]
    var cycle = 0
    try {
      val in = MemoryStream[(Long, String, String)]
      val fq = graft.streaming.EventStreams.frontierStream(
          in.toDF().toDF("doc_id", "url", "html"),
          "doc_id", "url", "html", rules, table) { (sched, _) =>
        // the caller's scheduling cycle (the charter: the budget stays
        // per cycle): k=2 shallowest per host, rank-ordered, delay 1s
        val cands = sched.select("link_canon", "link_host")
          .as[(String, String)].collect()
          .groupBy(_._2).toSeq.flatMap { case (host, urls) =>
            urls.map(_._1).distinct
              .sortBy(u => (u.count(_ == '/'), u)).take(2).zipWithIndex
              .map { case (u, i) =>
                FrontierCandidate(host, u, i + 1L, 1000000L) }
          }
        cands.foreach(c => cycleOf(c.url_canon) = cycle)
        if (cands.nonEmpty) { slotsIn.addData(cands: _*)
          slotsQ.processAllAvailable() }
      }
      cycle = 1
      in.addData(pages.take(10): _*); fq.processAllAvailable()
      cycle = 2
      in.addData(pages.drop(10): _*); fq.processAllAvailable()
      fq.stop()
      slotsQ.processAllAvailable()
      val slots = spark.table("loop_slots").as[FetchSlot].collect().toSeq
      assert(slots.nonEmpty)
      // every scheduled URL got exactly one slot
      assert(slots.map(_.url_canon).distinct.length == slots.length)
      // within a host and cycle: slots spaced exactly one delay apart;
      // across cycles: cycle 2 strictly after cycle 1 (the state)
      slots.groupBy(_.host).foreach { case (h, hs) =>
        val byCycle = hs.groupBy(s => cycleOf(s.url_canon))
        val sorted = hs.sortBy(_.fetch_at_micros).map(_.fetch_at_micros)
        sorted.sliding(2).foreach { w =>
          if (w.length == 2) assert(w(1) - w(0) == 1000000L,
            s"$h slots not delay-spaced: $sorted") }
        for (c1 <- byCycle.get(1); c2 <- byCycle.get(2))
          assert(c2.map(_.fetch_at_micros).min >
            c1.map(_.fetch_at_micros).max,
            s"$h: cycle 2 did not wait for cycle 1")
      }
      // at least one host genuinely scheduled in BOTH cycles
      assert(slots.groupBy(_.host).exists { case (_, hs) =>
        hs.exists(s => cycleOf(s.url_canon) == 1) &&
          hs.exists(s => cycleOf(s.url_canon) == 2) })
    } finally {
      slotsQ.stop()
      spark.sql("DROP DATABASE IF EXISTS graft_lpdb CASCADE")
    }
  }

  test("frontierStream replay safety: a batch whose onBatch FAILS re-emits " +
    "the identical candidate set on retry — novel targets are not " +
    "consumed by the failed attempt") {
    import graft.entry.TextQueries
    import graft.ext.UrlOps
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = (0L until 10L)
      .map(i => (i, s"body of page $i", "src" + (i % 5)))
      .toDF("doc_id", "text", "source")
    val rules = TextQueries.plantedRobotsRules(docs)
    val pages = TextQueries.withPlantedPage(UrlOps.withCanonicalUrl(
        TextQueries.withPlantedUrl(docs), "url"))
      .select("doc_id", "url", "html")
      .as[(Long, String, String)].collect().sortBy(_._1).toSeq
    val loc = java.nio.file.Files.createTempDirectory("graft_replay").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_rpdb LOCATION '$loc'")
    val table = "graft_rpdb.replay_seen"
    graft.streaming.EventStreams.initFrontierSeen(spark, table, nBuckets = 4)
    try {
      // attempt 1: onBatch computes its answer, then dies before the
      // caller could use it (the at-least-once hazard window)
      val firstAttempt = scala.collection.mutable.ArrayBuffer[String]()
      val in1 = MemoryStream[(Long, String, String)]
      val q1 = graft.streaming.EventStreams.frontierStream(
          in1.toDF().toDF("doc_id", "url", "html"),
          "doc_id", "url", "html", rules, table) { (sched, _) =>
        firstAttempt ++= sched.select("link_canon").as[String].collect()
        throw new RuntimeException("simulated scheduler failure")
      }
      in1.addData(pages: _*)
      intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q1.processAllAvailable()
      }
      q1.stop()
      assert(firstAttempt.nonEmpty, "fixture sanity: candidates existed")
      // retry (same batch, fresh query, SAME seen table): the novel set
      // must be COMPLETE — the failed attempt consumed nothing
      val retried = scala.collection.mutable.ArrayBuffer[String]()
      val in2 = MemoryStream[(Long, String, String)]
      val q2 = graft.streaming.EventStreams.frontierStream(
          in2.toDF().toDF("doc_id", "url", "html"),
          "doc_id", "url", "html", rules, table) { (sched, _) =>
        retried ++= sched.select("link_canon").as[String].collect()
      }
      in2.addData(pages: _*)
      q2.processAllAvailable()
      q2.stop()
      assert(retried.toSet === firstAttempt.toSet,
        "retry must re-emit exactly the failed attempt's candidates")
      // and the seen set holds each novel target exactly once
      val seen = spark.table(table).select("url_canon")
        .as[String].collect()
      assert(seen.distinct.length == seen.length)
    } finally {
      spark.sql("DROP DATABASE IF EXISTS graft_rpdb CASCADE")
    }
  }

  test("frontierStream: two micro-batches with cross-batch re-discoveries " +
    "emit exactly the one-shot pre-budget allowed set; the seen set " +
    "never duplicates") {
    import graft.entry.TextQueries
    import graft.ext.UrlOps
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the q154 plant over a 40-doc corpus: URLs, rules and pages from
    // the SAME generators the catalog query uses, split into two
    // ordered micro-batches (the crawl's ids-at-fetch-time contract)
    val docs = (0L until 40L)
      .map(i => (i, s"body of page $i", "src" + (i % 20)))
      .toDF("doc_id", "text", "source")
    val rules = TextQueries.plantedRobotsRules(docs)
    val pages = TextQueries.withPlantedPage(UrlOps.withCanonicalUrl(
        TextQueries.withPlantedUrl(docs), "url"))
      .select("doc_id", "url", "html")
      .as[(Long, String, String)].collect().sortBy(_._1)
    val loc = java.nio.file.Files.createTempDirectory("graft_seen").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_fsdb LOCATION '$loc'")
    val table = "graft_fsdb.frontier_seen"
    graft.streaming.EventStreams.initFrontierSeen(spark, table, nBuckets = 4)
    val emitted = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
    try {
      val in = MemoryStream[(Long, String, String)]
      val query = graft.streaming.EventStreams.frontierStream(
          in.toDF().toDF("doc_id", "url", "html"),
          "doc_id", "url", "html", rules, table) { (sched, _) =>
        // per-batch plan pin: the verdict's rule broadcast inside the
        // stream is host-PRUNED (the robotsVerdict broadcast-ceiling
        // contract) — the crawl-wide table never rides the broadcast
        import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
        import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
        val root = sched.queryExecution.executedPlan match {
          case a: AdaptiveSparkPlanExec => a.initialPlan
          case p => p
        }
        val ruleBes = root.collect {
          case e: BroadcastExchangeExec
            if e.output.exists(_.name == "__rr_prefix") => e
        }
        assert(ruleBes.nonEmpty, "no rule broadcast in the batch plan")
        ruleBes.foreach(e => assert(e.child.toString.contains("LeftSemi"),
          s"stream batch rule broadcast not host-pruned:\n${e.child}"))
        emitted ++= sched
          .select("link_canon", "link_host", "found_by")
          .as[(String, String, Long)].collect()
      }
      in.addData(pages.take(20): _*)
      query.processAllAvailable()
      in.addData(pages.drop(20): _*)
      query.processAllAvailable()
      query.stop()
      // one-shot truth: q154's stages before the per-host budget, over
      // ALL pages at once (the same operators, one batch)
      val canon = UrlOps.withCanonicalUrl(TextQueries.withPlantedUrl(docs),
        "url")
      val links = UrlOps.extractOutlinks(TextQueries.withPlantedPage(canon),
          "doc_id", "html", "url_canon", "url")
        .filter(col("link_canon").isNotNull)
      val cand = links.groupBy(col("link_canon"), col("link_host"))
        .agg(org.apache.spark.sql.functions.min(col("doc_id"))
          .as("found_by"))
      val fresh = cand.join(
        canon.select(col("url_canon").as("link_canon")).distinct(),
        Seq("link_canon"), "left_anti")
      val oneShot = UrlOps.robotsVerdict(fresh, "link_canon", "link_canon",
          rules)
        .filter(col("fetch_allowed"))
        .select("link_canon", "link_host", "found_by")
        .as[(String, String, Long)].collect().toSet
      assert(oneShot.nonEmpty)
      assert(emitted.toSet == oneShot,
        s"stream emitted ${emitted.size} != one-shot ${oneShot.size}; " +
          s"extra=${(emitted.toSet -- oneShot).take(3)} " +
          s"missing=${(oneShot -- emitted.toSet).take(3)}")
      // first arrival won: nothing was emitted twice across batches
      assert(emitted.map(_._1).distinct.size == emitted.size)
      // the seen set holds each URL once: 40 fetched seeds (4 hosts ×
      // port/path variants collapse some) + every discovered target
      val seen = spark.table(table).select("url_canon")
        .as[String].collect().toSeq
      assert(seen.distinct.size == seen.size,
        "seen set accumulated duplicate canonical URLs")
      // blocked targets are seen too (they must not resurface), so the
      // seen set is strictly larger than seeds + emitted
      val seeds = canon.select(col("url_canon")).distinct().count()
      assert(seen.size > seeds + emitted.size)
    } finally {
      spark.sql("DROP DATABASE IF EXISTS graft_fsdb CASCADE")
    }
  }
}
