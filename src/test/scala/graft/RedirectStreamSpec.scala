package graft

import graft.ext.UrlOps
import org.apache.spark.sql.functions._

/** Pins `EventStreams.redirectStream` — the cross-batch redirect
  * resolver — against its batch twin: emissions ∪ flush must equal
  * [[UrlOps.resolveRedirects]] over the union of all batches, in any
  * arrival order of a chain's hops, and a failed `onBatch` must
  * re-emit identically on retry.
  */
class RedirectStreamSpec extends SparkSpec {
  import spark.implicits._

  private def u(s: String) = s"https://$s.example.com/p"

  // the full response universe: a 2-hop chain, an A↔B loop, a
  // dangling redirect, a 4-hop chain that caps at maxHops=3, and the
  // terminals the chains land on
  private val responses: Seq[(String, Long, String)] = Seq(
    (u("a"), 301L, u("b")),
    (u("b"), 302L, u("c")),
    (u("c"), 200L, ""),
    (u("p"), 301L, u("q")),
    (u("q"), 301L, u("p")),
    (u("d"), 303L, "https://elsewhere.org/never-fetched"),
    (u("h1"), 307L, u("h2")),
    (u("h2"), 307L, u("h3")),
    (u("h3"), 307L, u("h4")),
    (u("h4"), 307L, u("h5")),
    (u("h5"), 200L, ""))

  private def oneShot: Set[(String, String, Long, String)] =
    UrlOps.resolveRedirects(
      responses.toDF("url", "status", "location"),
      "url", "status", "location", maxHops = 3)
      .collect()
      .map(r => (r.getString(0),
        if (r.isNullAt(1)) null else r.getString(1),
        r.getLong(2), r.getString(3)))
      .toSet

  private def runStream(batches: Seq[Seq[(String, Long, String)]],
      db: String): Set[(String, String, Long, String)] = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val loc = java.nio.file.Files.createTempDirectory("graft_rds").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db LOCATION '$loc'")
    val prefix = s"$db.rd"
    graft.streaming.EventStreams.initRedirectState(spark, prefix,
      nBuckets = 4)
    val emitted =
      scala.collection.mutable.ArrayBuffer[(String, String, Long, String)]()
    try {
      val in = MemoryStream[(String, Long, String)]
      val q = graft.streaming.EventStreams.redirectStream(
          in.toDF().toDF("url", "status", "location"),
          "url", "status", "location", prefix, maxHops = 3) { (out, _) =>
        emitted ++= out.collect().map(r => (r.getString(0),
          if (r.isNullAt(1)) null else r.getString(1),
          r.getLong(2), r.getString(3)))
      }
      batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
      q.stop()
      val flushed = graft.streaming.EventStreams
        .redirectFlush(spark, prefix)
        .collect().map(r => (r.getString(0), r.getString(1),
          r.getLong(2), r.getString(3)))
      (emitted ++ flushed).toSet
    } finally {
      spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    }
  }

  test("chains split across batches resolve; emissions + flush equal " +
    "the one-shot over the union (forward arrival order)") {
    val (b1, b2) = responses.splitAt(5)
    assert(runStream(Seq(b1, b2), "graft_rds1") == oneShot)
  }

  test("reverse arrival order — chain tails fetched before their " +
    "heads — gives the same answer") {
    val (b1, b2) = responses.splitAt(5)
    assert(runStream(Seq(b2, b1), "graft_rds2") == oneShot)
  }

  test("one response per batch (maximal splitting) still matches") {
    assert(runStream(responses.map(Seq(_)), "graft_rds3") == oneShot)
  }

  test("single batch matches (degenerate case)") {
    assert(runStream(Seq(responses), "graft_rds4") == oneShot)
  }

  test("a terminal arriving BEFORE its chain resolves the chain on " +
    "the chain's own batch, not at flush") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val loc = java.nio.file.Files.createTempDirectory("graft_rds5").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_rds5 LOCATION '$loc'")
    val prefix = "graft_rds5.rd"
    graft.streaming.EventStreams.initRedirectState(spark, prefix,
      nBuckets = 4)
    val perBatch = scala.collection.mutable.ArrayBuffer[(Long, Int)]()
    try {
      val in = MemoryStream[(String, Long, String)]
      val q = graft.streaming.EventStreams.redirectStream(
          in.toDF().toDF("url", "status", "location"),
          "url", "status", "location", prefix, maxHops = 3) { (out, id) =>
        perBatch += ((id, out.count().toInt))
      }
      in.addData((u("t"), 200L, "")); q.processAllAvailable()
      in.addData((u("s"), 301L, u("t"))); q.processAllAvailable()
      q.stop()
      assert(perBatch.toSeq == Seq((0L, 0), (1L, 1)))
      assert(graft.streaming.EventStreams
        .redirectFlush(spark, prefix).count() == 0)
    } finally {
      spark.sql("DROP DATABASE IF EXISTS graft_rds5 CASCADE")
    }
  }

  test("replay safety: a batch whose onBatch FAILS re-emits the " +
    "identical set on retry; state tables hold no duplicates") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val loc = java.nio.file.Files.createTempDirectory("graft_rds6").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_rds6 LOCATION '$loc'")
    val prefix = "graft_rds6.rd"
    graft.streaming.EventStreams.initRedirectState(spark, prefix,
      nBuckets = 4)
    try {
      val first = scala.collection.mutable.ArrayBuffer[String]()
      val in1 = MemoryStream[(String, Long, String)]
      val q1 = graft.streaming.EventStreams.redirectStream(
          in1.toDF().toDF("url", "status", "location"),
          "url", "status", "location", prefix, maxHops = 3) { (out, _) =>
        first ++= out.select("start_url").as[String].collect()
        throw new RuntimeException("simulated consumer failure")
      }
      in1.addData(responses: _*)
      intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q1.processAllAvailable()
      }
      q1.stop()
      assert(first.nonEmpty, "fixture sanity: emissions existed")
      val retried = scala.collection.mutable.ArrayBuffer[String]()
      val in2 = MemoryStream[(String, Long, String)]
      val q2 = graft.streaming.EventStreams.redirectStream(
          in2.toDF().toDF("url", "status", "location"),
          "url", "status", "location", prefix, maxHops = 3) { (out, _) =>
        retried ++= out.select("start_url").as[String].collect()
      }
      in2.addData(responses: _*)
      q2.processAllAvailable()
      q2.stop()
      assert(retried.toSet === first.toSet)
      val srcs = spark.table(s"${prefix}_edges").select("src")
        .as[String].collect()
      assert(srcs.distinct.length == srcs.length)
      val terms = spark.table(s"${prefix}_terminals").select("url_canon")
        .as[String].collect()
      assert(terms.distinct.length == terms.length)
    } finally {
      spark.sql("DROP DATABASE IF EXISTS graft_rds6 CASCADE")
    }
  }
}
