package graft

import graft.ext.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val png = Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte)
  private val jpeg = Array(0xFF.toByte, 0xD8.toByte, 0xFF.toByte)

  test("sniffFormat recognizes magic numbers, unknown otherwise") {
    val rows = Seq(
      ("png", png ++ "data".getBytes),
      ("jpeg", jpeg ++ "data".getBytes),
      ("riff", "RIFFxxxx".getBytes),
      ("mp3", "ID3v2".getBytes),
      ("unknown", "plain text".getBytes))
    val got = rows.toDF("want", "payload")
      .select(col("want"), Multimodal.sniffFormat(col("payload")).as("got"))
      .as[(String, String)].collect()
    got.foreach { case (want, g) => assert(g == want) }
  }

  test("withMediaMeta adds byte length, sha, format in one projection") {
    val df = Seq(Tuple1(png ++ "ab".getBytes)).toDF("payload")
    val r = Multimodal.withMediaMeta(df, "payload")
      .select("n_bytes", "content_sha", "format").head()
    assert(r.getInt(0) == 6)
    val jvm = java.security.MessageDigest.getInstance("SHA-256")
      .digest(png ++ "ab".getBytes).map("%02x".format(_)).mkString
    assert(r.getString(1) == jvm)
    assert(r.getString(2) == "png")
  }

  test("decodeImageStub is deterministic and in declared ranges") {
    val a = Multimodal.decodeImageStub("hello".getBytes)
    val b = Multimodal.decodeImageStub("hello".getBytes)
    assert(a == b)
    assert(a.width >= 64 && a.width <= 1920)
    assert(a.height >= 64 && a.height <= 1080)
    assert(Set(1, 3).contains(a.channels))
    assert(a.meanLuma >= 0.0 && a.meanLuma <= 1.0)
  }

  test("stub decode pinned bit-exactly for a known synthetic image (q36 anchor)") {
    // expected values computed INDEPENDENTLY (python hashlib over the
    // payload's uppercase hex — the stub's digest input) — this pins the
    // q36 feature vector itself, not stub-vs-stub
    val payload = Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte) ++
      "the quick brown fox".getBytes("UTF-8")
    val out = Multimodal.extractImageFeatures(
      Seq((1L, payload)).toDF("id", "payload"), "payload").head()
    assert(out.getAs[Int]("width") == 364)
    assert(out.getAs[Int]("height") == 199)
    assert(out.getAs[Int]("channels") == 3)
    assert(out.getAs[Double]("mean_luma") == 41525.0 / 65535.0)
    assert(out.getAs[Double]("aspect_ratio") == 364.0 / 199.0)
  }

  test("extractImageFeatures maps partitions, drops payload, keeps other cols") {
    val df = Seq((1L, "x", png), (2L, "y", jpeg)).toDF("id", "tag", "payload")
    val out = Multimodal.extractImageFeatures(df, "payload")
    assert(out.columns.toSeq == Seq("id", "tag", "width", "height",
      "channels", "mean_luma", "aspect_ratio"))
    assert(out.count() == 2)
    val r = out.filter(col("id") === 1L).head()
    val expect = Multimodal.decodeImageStub(png)
    assert(r.getAs[Int]("width") == expect.width)
    assert(math.abs(r.getAs[Double]("aspect_ratio") -
      expect.width.toDouble / expect.height) < 1e-9)
  }

  test("resizePlan fits within the box preserving aspect, never upscales") {
    val df = Seq((1000, 500), (100, 200), (50, 50)).toDF("w", "h")
    val out = Multimodal.resizePlan(df, "w", "h", maxW = 256, maxH = 256)
      .select("w", "h", "resized_width", "resized_height")
      .as[(Int, Int, Int, Int)].collect().map(r => (r._1, r._2) -> (r._3, r._4))
      .toMap
    assert(out((1000, 500)) == (256, 128))
    assert(out((100, 200)) == (100, 200)) // fits already: no upscale
    assert(out((50, 50)) == (50, 50))     // no upscale
  }

  test("sampleFramePlan emits n uniformly-spaced frame rows per video") {
    val out = Multimodal.sampleFramePlan(
        Seq((7L, 8000L)).toDF("id", "duration_ms"), "duration_ms", n = 4)
      .select("frame_idx", "frame_time_ms").as[(Int, Long)].collect().toSeq
    assert(out == Seq((0, 0L), (1, 2000L), (2, 4000L), (3, 6000L)))
  }

  test("syntheticMedia wraps text bytes with id-determined magics") {
    val docs = Seq((0L, "aa"), (1L, "bb"), (2L, "cc")).toDF("doc_id", "text")
    val media = Multimodal.syntheticMedia(docs, "doc_id", "text")
    val fmts = Multimodal.withMediaMeta(media, "payload")
      .select("doc_id", "format").as[(Long, String)].collect().toMap
    assert(fmts == Map(0L -> "png", 1L -> "jpeg", 2L -> "unknown"))
  }
}
