package graft

import graft.ext.Multimodal
import org.apache.spark.sql.functions._

/** Perceptual dHash over REAL ImageIO decode: bit-level agreement with
  * an independent plain-Scala reference on the generated pixels, the
  * planted-near-dup contract, band-bucket capping, and the decode
  * round-trip (PNG losslessness is what the whole oracle rests on).
  */
class ImageDHashSpec extends SparkSpec {
  import spark.implicits._

  /** Plain-Scala reference: pixels from the generation rule (not the
    * decoder), dHash bands from the spec'd layout. Gray pixels mean the
    * 299/587/114 luma is 1000·v — order-equivalent to comparing v. */
  private def refBands(seed: Long, bump: Int): Array[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def v(x: Int, y: Int): Int = {
      val d = md.digest(s"$seed:$y".getBytes("UTF-8"))
      ((d(x) & 0xFF) + (if (x == 0 && y == 0) bump else 0)) % 256
    }
    val bands = new Array[Long](4)
    for (y <- 0 until 8; x <- 0 until 8)
      if (v(x + 1, y) > v(x, y))
        bands(y / 2) |= 1L << ((y % 2) * 8 + x)
    bands
  }

  test("decoded dHash bands equal the generation-rule reference " +
    "(PNG round-trip is lossless)") {
    for (seed <- Seq(0L, 5L, 123L)) {
      val payload = Multimodal.encodePngHashPixels(seed, 9, 8)
      assert(Multimodal.dhashBandsReal(payload).get.toSeq
        == refBands(seed, 0).toSeq, s"seed $seed")
    }
  }

  test("undecodable payloads DROP (None), never throw: null, garbage, " +
    "and truncated-PNG inputs across all three banders") {
    // the withDHashBands contract is row-drop on undecodable input —
    // codec runtime exceptions (not just IOException) and null
    // payloads must all land on the None path, or one bad row in a
    // 100 TB corpus kills its whole task
    val garbage = Array.fill[Byte](64)(0x5A)
    val truncated = Multimodal.encodePngHashPixels(3L, 9, 8).take(20)
    for (bad <- Seq(null, Array.emptyByteArray, garbage, truncated)) {
      assert(Multimodal.dhashBandsReal(bad).isEmpty)
      assert(Multimodal.dhashBandsFrames(bad).isEmpty)
      assert(Multimodal.dhashBandsAudio(bad).isEmpty)
    }
  }

  test("the single-pixel bump flips at most one dHash bit") {
    for (seed <- Seq(0L, 8L, 64L)) {
      val a = refBands(seed, 0)
      val b = refBands(seed, 1)
      val ham = a.zip(b)
        .map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum
      assert(ham <= 1, s"seed $seed: bump moved $ham bits")
    }
  }

  test("planted pairs are found exactly; unrelated images stay apart") {
    val docs = spark.range(0, 64).toDF("doc_id")
    val media = Multimodal.syntheticRealPngNearDups(docs, "doc_id")
    val banded = Multimodal.withImageDHashBands(media, "payload")
    val pairs = Multimodal.imageNearDupPairs(banded, "doc_id",
        maxHamming = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = (0L until 64L by 8L).map(k => (k, k + 1)).toSet
    assert(planted.subsetOf(pairs),
      s"missed planted pairs: ${planted -- pairs}")
    // hash-random unrelated images sit ~32 bits apart; any extra pair
    // must at least be rare — allow chance band collisions but no flood
    assert(pairs.size <= planted.size + 2,
      s"near-dup flood: ${pairs.size} pairs for ${planted.size} planted")
  }

  /** Audio reference: samples from the generation rule, block means by
    * truncating division (≡ DuckDB integer `//`), adjacent-block
    * comparison bits. */
  private def refAudioBands(seed: Long, n: Int, bump: Int): Array[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def sample(i: Int): Long = {
      val d = md.digest(s"$seed:${i / 8}".getBytes("UTF-8"))
      val o = 2 * (i % 8)
      val raw = ((d(o) & 0xFF) << 8) | (d(o + 1) & 0xFF)
      Math.floorMod(raw + (if (i == 0) bump else 0), 65536).toLong - 32768L
    }
    val means = (0 until 65).map { b =>
      val (lo, hi) = (b * n / 65, (b + 1) * n / 65)
      (lo until hi).map(sample).sum / (hi - lo)
    }
    val bands = new Array[Long](4)
    for (c <- 0 until 64 if means(c + 1) > means(c))
      bands(c / 16) |= 1L << (c % 16)
    bands
  }

  test("decoded waveform bands equal the generation-rule reference " +
    "(PCM round-trip is lossless)") {
    for (seed <- Seq(0L, 2L, 77L)) {
      val n = 400 + (seed % 3).toInt * 200
      val payload = Multimodal.encodeWavHashSamples(seed, n)
      assert(Multimodal.dhashBandsAudio(payload).get.toSeq
        == refAudioBands(seed, n, 0).toSeq, s"seed $seed")
    }
  }

  test("audio planted pairs are found; the sample bump flips at most " +
    "one waveform bit") {
    for (seed <- Seq(0L, 16L)) {
      val n = 400 + (seed % 3).toInt * 200
      val a = refAudioBands(seed, n, 0)
      val b = refAudioBands(seed, n, 1)
      val ham = a.zip(b)
        .map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum
      assert(ham <= 1, s"seed $seed: bump moved $ham bits")
    }
    val docs = spark.range(0, 32).toDF("doc_id")
    val banded = Multimodal.withAudioDHashBands(
      Multimodal.syntheticRealWavNearDups(docs, "doc_id"), "payload")
    val pairs = Multimodal.imageNearDupPairs(banded, "doc_id",
        maxHamming = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = (0L until 32L by 8L).map(k => (k, k + 1)).toSet
    assert(planted.subsetOf(pairs),
      s"missed planted audio pairs: ${planted -- pairs}")
    assert(pairs.size <= planted.size + 2, s"audio near-dup flood: $pairs")
  }

  test("video: per-frame bands round-trip the lossless GIF, planted " +
    "clips match on every frame with frame 0 within 1 bit") {
    // frame-band reference straight from the generation rule
    def refFrameBands(seed: Long, f: Int, bump: Int): Array[Long] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      def v(x: Int, y: Int): Int = {
        val d = md.digest(s"$seed:$f:$y".getBytes("UTF-8"))
        ((d(x) & 0xFF) +
          (if (f == 0 && x == 0 && y == 0) bump else 0)) % 256
      }
      val bands = new Array[Long](4)
      for (y <- 0 until 8; x <- 0 until 8 if v(x + 1, y) > v(x, y))
        bands(y / 2) |= 1L << ((y % 2) * 8 + x)
      bands
    }
    val payload = Multimodal.encodeGifHashPixels(5L, 9, 8, nFrames = 3)
    val frames = Multimodal.dhashBandsFrames(payload).get
    assert(frames.length == 3)
    for (f <- 0 until 3)
      assert(frames(f).toSeq == refFrameBands(5L, f, 0).toSeq, s"frame $f")

    val docs = spark.range(0, 32).toDF("doc_id")
    val framed = Multimodal.withFrameDHashBands(
      Multimodal.syntheticRealGifNearDups(docs, "doc_id"), "payload")
    val pairs = Multimodal.videoNearDupPairs(framed, "doc_id",
        "frame_idx", maxHamming = 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    val planted = (0L until 32L by 8L).map(k => (k, k + 1))
    planted.foreach { p =>
      val (best, nMatches) = pairs.getOrElse(p, fail(s"missed pair $p"))
      // identical frames 1.. give best_hamming 0; every aligned frame
      // pair qualifies (2 + seed%3 frames), frame 0 within 1 bit
      assert(best == 0L, s"$p best=$best")
      val nf = 2 + (p._1 % 3)
      assert(nMatches >= nf, s"$p matched $nMatches of $nf frames")
    }
    assert(pairs.size <= planted.size + 2, s"video flood: ${pairs.keys}")
  }

  test("undecodable payloads drop from the banded relation") {
    val junk = Seq((1L, Array[Byte](1, 2, 3)),
      (2L, Multimodal.encodePngHashPixels(7L, 9, 8)))
      .toDF("doc_id", "payload")
    val out = Multimodal.withImageDHashBands(junk, "payload")
    assert(out.collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("oversized band buckets are capped out of candidate generation") {
    // 12 identical images → every band bucket holds 12 > cap 8 →
    // zero candidates survive (the documented recall trade)
    val docs = spark.range(0, 12).toDF("doc_id")
    val same = docs.as[Long].mapPartitions { ids =>
      val payload = Multimodal.encodePngHashPixels(99L, 9, 8)
      ids.map(id => (id, payload))
    }.toDF("doc_id", "payload")
    val banded = Multimodal.withImageDHashBands(same, "payload")
    assert(Multimodal.imageNearDupPairs(banded, "doc_id",
      maxHamming = 64, maxBucketSize = 8).count() == 0)
  }
}
