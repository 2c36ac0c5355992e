package graft

import graft.ext.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** Property coverage for the REAL JDK codec round trips over generated
  * shapes — 1-pixel images, single-sample clips, single-frame GIFs,
  * non-square extremes — not just the catalog's 8..12 dims. These are
  * actual codecs (ImageIO, javax.sound.sampled), so boundary shapes are
  * where real parser bugs live; every assertion is EXACT because all
  * three containers are lossless for the planted content.
  */
class MultimodalPropertySpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(20260814L)

  test("PNG round trip exact over random seeds and dims incl. 1-pixel edges") {
    val cases = Seq((0L, 1, 1), (1L, 1, 17), (2L, 31, 1)) ++
      (0 until 25).map(_ =>
        (rnd.nextLong(1L << 40), 1 + rnd.nextInt(32), 1 + rnd.nextInt(32)))
    cases.foreach { case (seed, w, h) =>
      val img = Multimodal.decodeImageReal(
        Multimodal.encodePngDeterministic(seed, w, h)).get
      assert(img.width == w && img.height == h && img.channels == 3,
        s"seed=$seed w=$w h=$h")
      var sum = 0L
      for (y <- 0 until h; x <- 0 until w) {
        sum += 299L * Math.floorMod(seed + 7L * x + 13L * y, 256L) +
          587L * Math.floorMod(3L * seed + 5L * x + 11L * y, 256L) +
          114L * Math.floorMod(7L * seed + 3L * x + 17L * y, 256L)
      }
      assert(img.meanLuma == sum.toDouble / (w.toLong * h * 1000L * 255L),
        s"seed=$seed w=$w h=$h")
    }
  }

  test("WAV round trip exact over random seeds and lengths incl. 1 sample") {
    val cases = Seq((0L, 1), (7L, 2), (9L, 3)) ++
      (0 until 25).map(_ => (rnd.nextLong(1L << 40), 1 + rnd.nextInt(2000)))
    cases.foreach { case (seed, n) =>
      val a = Multimodal.decodeAudioReal(
        Multimodal.encodeWavDeterministic(seed, n)).get
      assert(a.sampleRate == 8000 && a.channels == 1 && a.nSamples == n,
        s"seed=$seed n=$n")
      var sum = 0L
      for (i <- 0 until n)
        sum += math.abs(Math.floorMod(seed + 7919L * i, 65536L) - 32768L)
      assert(a.meanAbs == sum.toDouble / (n.toLong * 32768L), s"seed=$seed n=$n")
    }
  }

  test("GIF frames round trip exact over random seeds, dims, frame counts") {
    val cases = Seq((0L, 1, 1, 1), (3L, 1, 9, 2), (4L, 9, 1, 5)) ++
      (0 until 15).map(_ => (rnd.nextLong(1L << 40),
        1 + rnd.nextInt(16), 1 + rnd.nextInt(16), 1 + rnd.nextInt(5)))
    cases.foreach { case (seed, w, h, nf) =>
      val frames = Multimodal.decodeImageFramesReal(
        Multimodal.encodeGifDeterministic(seed, w, h, nf)).get
      assert(frames.size == nf, s"seed=$seed w=$w h=$h nf=$nf")
      frames.zipWithIndex.foreach { case (fr, f) =>
        assert(fr.width == w && fr.height == h)
        var sum = 0L
        for (y <- 0 until h; x <- 0 until w)
          sum += Math.floorMod(seed + 7L * x + 13L * y + 31L * f, 256L)
        assert(fr.meanLuma ==
          (1000L * sum).toDouble / (w.toLong * h * 1000L * 255L),
          s"seed=$seed w=$w h=$h frame=$f")
      }
    }
  }

  test("decoders are total on fuzzed garbage: None, never a throw") {
    (0 until 200).foreach { i =>
      val len = rnd.nextInt(256)
      val junk = Array.fill(len)(rnd.nextInt(256).toByte)
      // seeding with real magics makes the parsers engage, then fail
      if (i % 3 == 0 && len >= 4) {
        junk(0) = 0x89.toByte; junk(1) = 'P'; junk(2) = 'N'; junk(3) = 'G'
      } else if (i % 3 == 1 && len >= 4) {
        junk(0) = 'R'; junk(1) = 'I'; junk(2) = 'F'; junk(3) = 'F'
      }
      Multimodal.decodeImageReal(junk)
      Multimodal.decodeAudioReal(junk)
      Multimodal.decodeImageFramesReal(junk)
      // stubs stay total too
      Multimodal.decodeImageOrStub(junk)
      Multimodal.decodeAudioOrStub(junk)
    }
  }
}
