package graft

import graft.ext.Multimodal
import org.apache.spark.sql.functions._

/** Persisted dHash index + probe + streaming loop: probe parity with
  * the self-join pairs operator, per-batch purity against the static
  * index, and the append-then-probe ingest cycle.
  */
class MediaIndexSpec extends SparkSpec {
  import spark.implicits._

  private def media(ids: Range): org.apache.spark.sql.DataFrame =
    Multimodal.syntheticRealPngNearDups(
      ids.map(_.toLong).toDF("doc_id"), "doc_id")

  private lazy val table: String = {
    val loc = java.nio.file.Files.createTempDirectory("graft_dh").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_dhdb LOCATION '$loc'")
    // corpus: the EVEN-multiple-of-8 members only (8k) — probes bring
    // their 8k+1 near-dup partners
    val corpus = media(0 until 64).filter(col("doc_id") % 8 === 0)
    Multimodal.writeDHashIndex(
      Multimodal.withImageDHashBands(corpus, "payload"), "doc_id",
      "graft_dhdb.idx", nBuckets = 4)
    "graft_dhdb.idx"
  }

  test("probing the planted partners finds each corpus member at " +
    "hamming <= 1; unrelated probes stay silent") {
    val probes = media(0 until 64).filter(col("doc_id") % 8 === 1)
    val banded = Multimodal.withImageDHashBands(probes, "payload")
    val hits = Multimodal.dhashProbeIndexed(spark, table, banded,
        "doc_id", maxHamming = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val planted = (0L until 64L by 8L).map(k => (k + 1, k)).toSet
    assert(hits.map(h => (h._1, h._2)).toSet == planted,
      s"got ${hits.toSeq}")
    assert(hits.forall(_._3 <= 1), s"hamming above 1: ${hits.toSeq}")
    // unrelated fresh images (seeds far outside the corpus) find nothing
    val cold = Multimodal.withImageDHashBands(media(1000 until 1008)
      .filter(col("doc_id") % 8 === 0), "payload")
    assert(Multimodal.dhashProbeIndexed(spark, table, cold, "doc_id",
      maxHamming = 10).count() == 0)
  }

  test("probe under a different band geometry fails loudly instead of " +
    "matching nothing") {
    val probes = media(0 until 8).filter(col("doc_id") % 8 === 1)
    val banded = Multimodal.withImageDHashBands(probes, "payload")
    // halve the band count: a different bander family — every band
    // value comes from different bit groups, so the probe would be a
    // silent zero-match without the geometry guard
    val rebanded = banded.withColumn("bands",
      slice(col("bands"), 1, 2))
    intercept[IllegalArgumentException] {
      Multimodal.dhashProbeIndexed(spark, table, rebanded, "doc_id",
        maxHamming = 10).collect()
    }
  }

  test("streaming probe: union of micro-batches equals one probe of " +
    "everything streamed") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Long]
    val acc = scala.collection.mutable.ArrayBuffer.empty[Seq[Any]]
    val query = graft.streaming.EventStreams.mediaNearDupProbeStream(
        Multimodal.syntheticRealPngNearDups(in.toDF().toDF("doc_id"),
          "doc_id"),
        table, "doc_id", "payload", Multimodal.dhashBandsReal,
        maxHamming = 10) {
      (batch, _) => acc.synchronized { acc ++= batch.collect().map(_.toSeq) }
    }
    in.addData(1L, 9L)
    query.processAllAvailable()
    in.addData(17L, 3L) // 3 is seed-unique → no hit
    query.processAllAvailable()
    query.stop()
    val oneShot = Multimodal.dhashProbeIndexed(spark, table,
        Multimodal.withImageDHashBands(media(0 until 64)
          .filter(col("doc_id").isin(1L, 9L, 17L, 3L)), "payload"),
        "doc_id", maxHamming = 10)
      .collect().map(_.toSeq)
    assert(acc.toSet == oneShot.toSet && acc.nonEmpty)
  }

  private lazy val videoTable: String = {
    val loc = java.nio.file.Files.createTempDirectory("graft_vdh").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_vdhdb LOCATION '$loc'")
    val corpus = Multimodal.syntheticRealGifNearDups(
        (0 until 64).map(_.toLong).toDF("doc_id"), "doc_id")
      .filter(col("doc_id") % 8 === 0)
    // FRAME-level index under the CLIP key: one postings/bands row per
    // frame — writeDHashIndex unchanged
    Multimodal.writeDHashIndex(
      Multimodal.withFrameDHashBands(corpus, "payload")
        .select(col("doc_id"), col("bands")),
      "doc_id", "graft_vdhdb.idx", nBuckets = 4)
    "graft_vdhdb.idx"
  }

  test("video probe: planted partner clips found with best_hamming <= 1 " +
    "and every aligned frame matching; unrelated clips silent") {
    val gifs = Multimodal.syntheticRealGifNearDups(
      (0 until 64).map(_.toLong).toDF("doc_id"), "doc_id")
    val probes = Multimodal.withFrameDHashBands(
      gifs.filter(col("doc_id") % 8 === 1), "payload")
    val hits = Multimodal.videoNearDupProbeIndexed(spark, videoTable,
        probes, "doc_id", maxHamming = 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val planted = (0L until 64L by 8L).map(k => (k + 1, k)).toSet
    assert(hits.map(h => (h._1, h._2)).toSet == planted, s"got ${hits.toSeq}")
    // pair members share every frame except the bumped frame 0, so the
    // best frame pair is exact and at least the clip's frame count of
    // frame PAIRS qualifies (2 + seed%3 frames per clip)
    hits.foreach { case (p, c, best, nMatches) =>
      assert(best == 0L, s"($p,$c) best=$best")
      assert(nMatches >= 2L + c % 3, s"($p,$c) matches=$nMatches")
    }
    // seed-unique clips probe silent
    val cold = Multimodal.withFrameDHashBands(
      Multimodal.syntheticRealGifNearDups(
        (1000 until 1008).map(_.toLong).toDF("doc_id"), "doc_id")
        .filter(col("doc_id") % 8 === 0), "payload")
    assert(Multimodal.videoNearDupProbeIndexed(spark, videoTable, cold,
      "doc_id", maxHamming = 10).count() == 0)
  }

  test("streaming video probe: union of 2 real micro-batches equals " +
    "one probe of everything streamed") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Long]
    val acc = scala.collection.mutable.ArrayBuffer.empty[Seq[Any]]
    val query = graft.streaming.EventStreams.videoNearDupProbeStream(
        Multimodal.syntheticRealGifNearDups(in.toDF().toDF("doc_id"),
          "doc_id"),
        videoTable, "doc_id", "payload", maxHamming = 10) {
      (batch, _) => acc.synchronized { acc ++= batch.collect().map(_.toSeq) }
    }
    in.addData(1L, 9L)
    query.processAllAvailable()
    in.addData(17L, 3L) // 3 is seed-unique → no hit
    query.processAllAvailable()
    query.stop()
    val oneShot = Multimodal.videoNearDupProbeIndexed(spark, videoTable,
        Multimodal.withFrameDHashBands(
          Multimodal.syntheticRealGifNearDups(
            Seq(1L, 9L, 17L, 3L).toDF("doc_id"), "doc_id"), "payload"),
        "doc_id", maxHamming = 10)
      .collect().map(_.toSeq)
    assert(acc.toSet == oneShot.toSet && acc.nonEmpty)
  }

  test("append grows the corpus: a re-probe finds partners of the " +
    "appended members") {
    val fresh = media(64 until 128).filter(col("doc_id") % 8 === 0)
    Multimodal.appendToDHashIndex(
      Multimodal.withImageDHashBands(fresh, "payload"), "doc_id", table)
    val probe = Multimodal.withImageDHashBands(
      media(64 until 128).filter(col("doc_id") % 8 === 1), "payload")
    val hits = Multimodal.dhashProbeIndexed(spark, table, probe,
        "doc_id", maxHamming = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = (64L until 128L by 8L).map(k => (k + 1, k)).toSet
    assert(hits == planted, s"got $hits")
  }
}
