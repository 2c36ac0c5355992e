package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage decomposition of the q153 outlink pipeline at bench scale —
  * which leg owns the wall time: the href harvest regex, the per-link
  * canonicalization chain, or the edge rollup. Informs whether a
  * native harvest `Expression` would pay (the q133/Q133Profile
  * adjudication discipline: measure before optimizing).
  */
object UrlFamilyProfile {
  import BenchUtil.time

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ext.UrlOps
    import graft.entry.TextQueries
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val canon = UrlOps.withCanonicalUrl(
      TextQueries.withPlantedUrl(docs), "url")
    val pages = TextQueries.withPlantedPage(canon)
      .select("doc_id", "url", "url_canon", "html")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pages.count()
    for (rep <- 1 to 3) {
      val (nHarvest, tHarvest) = time {
        pages.select(col("doc_id"), explode(regexp_extract_all(col("html"),
          lit(UrlOps.HrefPattern), lit(1))).as("href_raw")).count()
      }
      val (nLinks, tResolve) = time {
        UrlOps.extractOutlinks(pages, "doc_id", "html", "url_canon", "url")
          .filter(col("link_canon").isNotNull).count()
      }
      val (nEdges, tFull) = time {
        UrlOps.hostLinkGraph(
          UrlOps.extractOutlinks(pages, "doc_id", "html", "url_canon", "url")
            .withColumn("src_host", UrlOps.urlHost(col("base_canon"))),
          "src_host").count()
      }
      println(f"[prof rep$rep] harvest=$tHarvest%.2f s ($nHarvest rows)  " +
        f"+resolve+canon=$tResolve%.2f s ($nLinks links)  " +
        f"full q153=$tFull%.2f s ($nEdges edges)")
    }
    spark.stop()
  }
}
