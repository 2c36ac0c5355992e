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

  test("every even document repairs exactly the planted damage") {
    val rows = SparkEntry.queries("q149_crawl_funnel")(spark, dir)
      .filter(col("doc_id") % 2 === 0)
      .select(col("chars_collapsed")).collect()
    val expected = graft.entry.TextQueries.MojibakeDamaged.length -
      graft.entry.TextQueries.MojibakeClean.length
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(0) == expected.toLong))
  }
}
