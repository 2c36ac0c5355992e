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

  // A REAL 3×2 RGB PNG, hand-pinned byte-for-byte (79 bytes, generated
  // once with the JDK encoder and frozen here): pixels row 0 = pure red,
  // green, blue; row 1 = black, white, gray 0x808080. The decode must
  // recover these exact pixels — expected luma sum computed by hand:
  // 299·255 + 587·255 + 114·255 + 0 + 1000·255 + 1000·128 = 638000.
  private val pinnedPng: Array[Byte] = java.util.Base64.getDecoder.decode(
    "iVBORw0KGgoAAAANSUhEUgAAAAMAAAACCAIAAAASFvFNAAAAFklEQVR4XmP4z8DAAMMM" +
    "////b2hoAAA+2Ad70iJhegAAAABJRU5ErkJggg==")

  test("decodeImageReal recovers the hand-pinned PNG byte-for-byte") {
    assert(pinnedPng.length == 79)
    val img = Multimodal.decodeImageReal(pinnedPng).get
    assert(img.width == 3)
    assert(img.height == 2)
    assert(img.channels == 3)
    assert(img.meanLuma == 638000.0 / (3L * 2 * 1000 * 255))
  }

  test("decodeImageReal returns None on non-image payloads; OrStub falls back") {
    val fake = png ++ "not actually a png".getBytes("UTF-8")
    assert(Multimodal.decodeImageReal(fake).isEmpty)
    assert(Multimodal.decodeImageReal("plain text".getBytes).isEmpty)
    assert(Multimodal.decodeImageOrStub(fake) == Multimodal.decodeImageStub(fake))
  }

  test("encodePngDeterministic round-trips through the real decoder exactly") {
    for (seed <- Seq(0L, 4L, 123456L)) {
      val w = 8 + (seed % 5).toInt
      val h = 8 + (seed % 3).toInt
      val img = Multimodal.decodeImageReal(
        Multimodal.encodePngDeterministic(seed, w, h)).get
      assert(img.width == w && img.height == h && img.channels == 3)
      var sum = 0L
      for (y <- 0 until h; x <- 0 until w) {
        sum += 299L * Math.floorMod(seed + 7L * x + 13L * y, 256L) +
          587L * Math.floorMod(3L * seed + 5L * x + 11L * y, 256L) +
          114L * Math.floorMod(7L * seed + 3L * x + 17L * y, 256L)
      }
      assert(img.meanLuma == sum.toDouble / (w.toLong * h * 1000L * 255L))
    }
  }

  test("extractImageFeaturesReal decodes real payloads, stubs the rest") {
    val df = Seq((1L, pinnedPng), (2L, png ++ "junk".getBytes))
      .toDF("id", "payload")
    val out = Multimodal.extractImageFeaturesReal(df, "payload")
    assert(out.columns.toSeq == Seq("id", "width", "height",
      "channels", "mean_luma", "aspect_ratio"))
    val real = out.filter(col("id") === 1L).head()
    assert(real.getAs[Int]("width") == 3 && real.getAs[Int]("height") == 2)
    val stubbed = out.filter(col("id") === 2L).head()
    val expect = Multimodal.decodeImageStub(png ++ "junk".getBytes)
    assert(stubbed.getAs[Int]("width") == expect.width)
    assert(stubbed.getAs[Int]("height") == expect.height)
  }

  test("pngHeaderWidth/Height parse IHDR without decoding; null on non-PNG") {
    val df = Seq((1L, pinnedPng), (2L, png ++ "tiny".getBytes),
        (3L, "plain".getBytes)).toDF("id", "payload")
    val got = df.select(col("id"),
        Multimodal.pngHeaderWidth(col("payload")).as("w"),
        Multimodal.pngHeaderHeight(col("payload")).as("h"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)))).toMap
    assert(got(1L) == (Some(3L), Some(2L)))
    assert(got(2L) == (None, None)) // PNG magic but shorter than a header
    assert(got(3L) == (None, None))
  }

  test("syntheticRealPng emits decodable PNGs whose dims follow the id formula") {
    val docs = Seq(0L, 4L, 8L).toDF("doc_id")
    val media = Multimodal.syntheticRealPng(docs, "doc_id").collect()
    media.foreach { r =>
      val id = r.getLong(0)
      val img = Multimodal.decodeImageReal(r.getAs[Array[Byte]](1)).get
      assert(img.width == 8 + (id % 5).toInt)
      assert(img.height == 8 + (id % 3).toInt)
    }
  }

  // A REAL mono 16-bit PCM WAV, hand-assembled byte by byte in the test
  // (44-byte canonical header + 4 known samples): 0, +16384, −32768,
  // +32767. Expected mean |amplitude| = (0+16384+32768+32767)/(4·32768).
  private def pinnedWav: Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(52)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(44)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(16000)
      .putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(8)
      .putShort(0).putShort(16384).putShort(-32768).putShort(32767)
    bb.array
  }

  test("decodeAudioReal recovers the hand-assembled WAV sample-for-sample") {
    val a = Multimodal.decodeAudioReal(pinnedWav).get
    assert(a.sampleRate == 8000)
    assert(a.channels == 1)
    assert(a.nSamples == 4)
    assert(a.meanAbs == (0L + 16384 + 32768 + 32767).toDouble / (4L * 32768))
  }

  test("decodeAudioReal returns None on non-audio payloads; OrStub falls back") {
    val junk = "RIFFnot really audio".getBytes("US-ASCII")
    assert(Multimodal.decodeAudioReal(junk).isEmpty)
    assert(Multimodal.decodeAudioReal(pinnedPng).isEmpty)
    assert(Multimodal.decodeAudioOrStub(junk) == Multimodal.decodeAudioStub(junk))
  }

  test("encodeWavDeterministic round-trips through the real decoder exactly") {
    for (seed <- Seq(1L, 5L, 98765L)) {
      val n = 400 + (seed % 3).toInt * 200
      val a = Multimodal.decodeAudioReal(
        Multimodal.encodeWavDeterministic(seed, n)).get
      assert(a.sampleRate == 8000 && a.channels == 1 && a.nSamples == n)
      var sum = 0L
      for (i <- 0 until n)
        sum += math.abs(Math.floorMod(seed + 7919L * i, 65536L) - 32768L)
      assert(a.meanAbs == sum.toDouble / (n.toLong * 32768L))
    }
  }

  test("wavHeaderSampleRate parses the fmt chunk; null on non-WAV") {
    val df = Seq((1L, pinnedWav), (2L, "RIFFxxxxAVI LIST".getBytes),
        (3L, "plain".getBytes)).toDF("id", "payload")
    val got = df.select(col("id"),
        Multimodal.wavHeaderSampleRate(col("payload")).as("sr"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got(1L) == Some(8000L))
    assert(got(2L) == None) // RIFF but not WAVE
    assert(got(3L) == None)
  }

  test("extractAudioFeatures maps partitions, drops payload, keeps other cols") {
    val df = Seq((1L, "x", pinnedWav), (2L, "y", "junk".getBytes))
      .toDF("id", "tag", "payload")
    val out = Multimodal.extractAudioFeatures(df, "payload")
    assert(out.columns.toSeq == Seq("id", "tag", "sample_rate", "channels",
      "n_samples", "mean_abs"))
    val real = out.filter(col("id") === 1L).head()
    assert(real.getAs[Int]("sample_rate") == 8000)
    assert(real.getAs[Long]("n_samples") == 4L)
    val stubbed = out.filter(col("id") === 2L).head()
    val expect = Multimodal.decodeAudioStub("junk".getBytes)
    assert(stubbed.getAs[Int]("sample_rate") == expect.sampleRate)
  }

  test("encodeGifDeterministic frames round-trip through the real decoder exactly") {
    for (seed <- Seq(2L, 6L, 31337L)) {
      val w = 8 + (seed % 5).toInt
      val h = 8 + (seed % 3).toInt
      val nf = 2 + (seed % 3).toInt
      val frames = Multimodal.decodeImageFramesReal(
        Multimodal.encodeGifDeterministic(seed, w, h, nf)).get
      assert(frames.size == nf)
      frames.zipWithIndex.foreach { case (fr, f) =>
        assert(fr.width == w && fr.height == h)
        var sum = 0L
        for (y <- 0 until h; x <- 0 until w)
          sum += Math.floorMod(seed + 7L * x + 13L * y + 31L * f, 256L)
        // grayscale: luma milli-weights sum to 1000·level
        assert(fr.meanLuma == (1000L * sum).toDouble / (w.toLong * h * 1000L * 255L),
          s"seed=$seed frame=$f")
      }
    }
  }

  test("decodeImageFramesReal: single-frame image yields one element; junk None") {
    val frames = Multimodal.decodeImageFramesReal(pinnedPng).get
    assert(frames == Seq(Multimodal.decodeImageReal(pinnedPng).get))
    assert(Multimodal.decodeImageFramesReal("junk".getBytes).isEmpty)
  }

  test("extractFrameFeatures explodes frames, stubs unparseable payloads") {
    val gif = Multimodal.encodeGifDeterministic(2L, 10, 10, 4)
    val df = Seq((1L, gif), (2L, "junk".getBytes)).toDF("id", "payload")
    val out = Multimodal.extractFrameFeatures(df, "payload")
    assert(out.columns.toSeq ==
      Seq("id", "frame_idx", "width", "height", "mean_luma"))
    val gifRows = out.filter(col("id") === 1L).collect()
    assert(gifRows.map(_.getAs[Int]("frame_idx")).sorted.toSeq == Seq(0, 1, 2, 3))
    val stubRows = out.filter(col("id") === 2L).collect()
    assert(stubRows.length == 1 && stubRows(0).getAs[Int]("frame_idx") == 0)
    assert(stubRows(0).getAs[Int]("width") ==
      Multimodal.decodeImageStub("junk".getBytes).width)
  }

  test("extractImageFeaturesReal runs under Structured Streaming, batch-identical") {
    // the decode seam is a plain Dataset transform, so streaming
    // multimodal ingest (readStream → decode → features) works without
    // a separate code path — streamed output must equal the batch run
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val payloads = Seq(
      (1L, pinnedPng), // real decode
      (2L, Multimodal.encodePngDeterministic(7L, 9, 8)),
      (3L, (png ++ "junk".getBytes))) // stub fallback
    val in = MemoryStream[(Long, Array[Byte])]
    val q = Multimodal.extractImageFeaturesReal(
        in.toDF().toDF("id", "payload"), "payload")
      .writeStream.format("memory").queryName("media_stream")
      .outputMode("append").start()
    try {
      in.addData(payloads.take(2))
      q.processAllAvailable()
      in.addData(payloads.drop(2)) // second micro-batch
      q.processAllAvailable()
      val streamed = spark.table("media_stream").collect()
        .map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
      val batch = Multimodal.extractImageFeaturesReal(
          payloads.toDF("id", "payload"), "payload").collect()
        .map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
      assert(streamed.length == 3 && streamed.toSeq == batch.toSeq)
    } finally q.stop()
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
