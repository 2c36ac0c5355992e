package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) columns for training-data pipelines.
  *
  * Media travel as opaque `binary` columns plus typed metadata — the only
  * representation that scales: payloads stay columnar/compressed in
  * parquet, metadata is pushdown-filterable, and decode happens ONLY in
  * explicitly batched operators at the edge of the plan.
  *
  * Decode paths: `decodeImageReal` decodes actual pixels through the
  * JDK's `javax.imageio` (PNG/JPEG/BMP/GIF ship with the JDK — no new
  * dependency); `decodeImageStub` remains as the deterministic fallback
  * for containers ImageIO cannot parse and as the cross-engine
  * oracle-parity path (its pixel math is hash-derived, reproducible in
  * plain SQL). Both run behind the same `mapPartitions` seam.
  */
object Multimodal {

  // ImageIO's stream factories default to a DISK-backed cache: every
  // encode/decode call creates, writes, and deletes a temp file. At a
  // bench pass of 10⁵ sub-KB payloads that is 10⁵ filesystem round
  // trips per stage whose cost drifts with tmp-dir state — measured as
  // the q133/q108 round-over-round wobble on untouched code. Our
  // payloads are small by contract (media META travels columnar,
  // payloads decode at the seam), so the in-memory cache is strictly
  // better. JVM-global; the object loads on every executor that
  // references a decode seam.
  javax.imageio.ImageIO.setUseCache(false)

  /** Uppercase hex digits as ASCII bytes — matches `hex()` in Spark and
    * DuckDB (the q36 oracle hashes the same string).
    */
  private val HexDigits: Array[Byte] =
    "0123456789ABCDEF".getBytes("US-ASCII")

  // ------------------------------------------------------------ metadata

  /** Byte length of a binary payload. */
  def byteLength(payload: Column): Column = length(payload)

  /** Lowercase hex SHA-256 of a binary payload — stable content id. */
  def contentSha(payload: Column): Column = sha2(payload, 256)

  /** Magic numbers for container-format sniffing (public file-format
    * specs): prefix → format label. Checked longest-first.
    */
  val Magics: Seq[(Array[Byte], String)] = Seq(
    Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte) -> "png",
    Array(0xFF.toByte, 0xD8.toByte, 0xFF.toByte) -> "jpeg",
    Array('R'.toByte, 'I'.toByte, 'F'.toByte, 'F'.toByte) -> "riff", // wav/avi
    Array('I'.toByte, 'D'.toByte, '3'.toByte) -> "mp3",
    Array('O'.toByte, 'g'.toByte, 'g'.toByte, 'S'.toByte) -> "ogg",
    Array(0x1A.toByte, 0x45.toByte, 0xDF.toByte, 0xA3.toByte) -> "mkv"
  )

  /** Sniff the container format from the payload's leading bytes — pure
    * column expression (codegen'd, no UDF): a `when` cascade over prefix
    * equality against binary literals.
    */
  def sniffFormat(payload: Column): Column =
    Magics.foldRight(lit("unknown")) { case ((magic, label), other) =>
      when(substring(payload, 1, magic.length) === lit(magic), label)
        .otherwise(other)
    }

  /** Metadata projection for a media table: byte size, content hash,
    * sniffed format. One scan, all codegen.
    */
  def withMediaMeta(df: DataFrame, payloadCol: String): DataFrame =
    df.withColumn("n_bytes", byteLength(col(payloadCol)))
      .withColumn("content_sha", contentSha(col(payloadCol)))
      .withColumn("format", sniffFormat(col(payloadCol)))

  // ------------------------------------------------------------- decode

  /** Decoded-image record produced by the decode stage. */
  final case class DecodedImage(width: Int, height: Int, channels: Int,
                                meanLuma: Double)

  /** STUB — deterministic fake decode. A real implementation would parse
    * the container and decode pixels here; the container image lacks codec
    * libraries, so dimensions and luma are derived from the payload hash
    * (stable across runs/engines). Everything downstream treats the result
    * exactly as it would a real decode.
    *
    * The digest input is the payload's UPPERCASE HEX, not its raw bytes:
    * `hex()` is uppercase in Spark and DuckDB alike, and SQL engines'
    * hash functions typically take strings — hashing the hex makes the
    * whole feature vector reproducible as `sha256(hex(payload))` in plain
    * SQL, which is what lets q36 be oracle-checked end to end.
    */
  def decodeImageStub(payload: Array[Byte]): DecodedImage = {
    // table-lookup hex (a per-byte format call costs ~1 µs — measured 9×
    // on q36 — while this is two array reads)
    val hexDigits = Multimodal.HexDigits
    val hexBytes = new Array[Byte](payload.length * 2)
    var i = 0
    while (i < payload.length) {
      val b = payload(i) & 0xFF
      hexBytes(2 * i) = hexDigits(b >>> 4)
      hexBytes(2 * i + 1) = hexDigits(b & 0xF)
      i += 1
    }
    val d = java.security.MessageDigest.getInstance("SHA-256")
      .digest(hexBytes)
    def u(i: Int): Int = d(i) & 0xFF
    val width = 64 + ((u(0) << 8 | u(1)) % 1857)  // 64..1920
    val height = 64 + ((u(2) << 8 | u(3)) % 1017) // 64..1080
    val channels = if (u(4) % 4 == 0) 1 else 3
    val meanLuma = (u(5) << 8 | u(6)).toDouble / 65535.0
    DecodedImage(width, height, channels, meanLuma)
  }

  /** REAL decode through the JDK's `javax.imageio` readers (PNG, JPEG,
    * BMP, GIF, WBMP — whatever the running JDK registers). Returns None
    * when no registered reader accepts the payload (ImageIO yields null)
    * or the stream is corrupt — callers fall back to the stub.
    *
    * Pixel access goes through `getRGB` (packed sRGB), which is
    * independent of the reader's internal raster layout (TYPE_3BYTE_BGR
    * vs TYPE_INT_RGB vs indexed); alpha, if present, is ignored for
    * luma. Mean luma uses integer Rec.601 milli-weights accumulated in a
    * Long — 299R + 587G + 114B per pixel — then ONE double division by
    * (w * h * 1000 * 255). The sum is exact and order-independent, so
    * the resulting double is bit-stable and predictable by any engine
    * that can reproduce the pixel values (what makes q106 oracle-
    * checkable: PNG is lossless, so the round-trip pixels are knowable).
    * Grayscale needs no special case: getRGB expands gray to R=G=B and
    * the milli-weights sum to 1000.
    */
  private def featuresOf(img: java.awt.image.BufferedImage): DecodedImage = {
    val w = img.getWidth
    val h = img.getHeight
    var sum = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        sum += 299L * ((rgb >>> 16) & 0xFF) + 587L * ((rgb >>> 8) & 0xFF) +
          114L * (rgb & 0xFF)
        x += 1
      }
      y += 1
    }
    DecodedImage(w, h, img.getColorModel.getNumComponents,
      sum.toDouble / (w.toLong * h * 1000L * 255L))
  }

  def decodeImageReal(payload: Array[Byte]): Option[DecodedImage] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) None else Some(featuresOf(img))
    } catch { case _: Exception => None }

  /** REAL multi-frame decode for animated containers (the JDK's GIF
    * reader exposes frame sequences): one [[DecodedImage]] per stored
    * frame, in order. None when no reader accepts the payload; a
    * single-frame image yields a 1-element sequence. This is the decode
    * half of the video story — [[sampleFramePlan]] picks indices, this
    * reads them.
    */
  def decodeImageFramesReal(payload: Array[Byte]): Option[Seq[DecodedImage]] =
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis)
            val n = reader.getNumImages(true)
            Some((0 until n).map(i => featuresOf(reader.read(i))))
          } finally reader.dispose()
        }
      } finally iis.close()
    } catch { case _: Exception => None }

  /** Real decode with declared stub fallback: payloads ImageIO cannot
    * parse keep the deterministic hash-derived features, so a mixed
    * corpus (decodable + opaque containers) still yields a total,
    * reproducible feature set.
    */
  def decodeImageOrStub(payload: Array[Byte]): DecodedImage =
    decodeImageReal(payload).getOrElse(decodeImageStub(payload))

  /** Image feature schema appended by `extractImageFeatures`. */
  val ImageFeatureSchema: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("mean_luma", DoubleType),
    StructField("aspect_ratio", DoubleType)))

  /** Batched decode + feature extraction over a media table:
    * `mapPartitions` so any real decoder amortizes per-partition init
    * (model load, codec context) across the whole partition — the Scala
    * analog of a Pandas `mapInPandas` batch UDF. Output schema = input
    * columns (minus payload) + ImageFeatureSchema: payloads are DROPPED on
    * the way out so the expensive bytes never cross the next shuffle.
    */
  def extractImageFeatures(df: DataFrame, payloadCol: String,
      decode: Array[Byte] => DecodedImage = decodeImageStub): DataFrame = {
    val inSchema = df.schema
    val payloadIdx = inSchema.fieldIndex(payloadCol)
    val keptIdx = inSchema.indices.filterNot(_ == payloadIdx)
    val outSchema = StructType(
      keptIdx.map(inSchema.fields(_)) ++ ImageFeatureSchema.fields)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      // per-partition init for a stateful decoder would go here (ImageIO
      // readers are looked up per call; a codec context would be cached)
      rows.map { r =>
        val img = decode(r.getAs[Array[Byte]](payloadIdx))
        // Seq[Any] — a plain Seq would unify Int/Double and silently widen
        // the Int fields, breaking the declared IntegerType schema
        Row.fromSeq(
          keptIdx.map(r.get) ++ Seq[Any](img.width, img.height, img.channels,
            img.meanLuma, img.width.toDouble / img.height))
      }
    }(enc)
  }

  /** `extractImageFeatures` with REAL pixels: ImageIO decode where a
    * registered reader accepts the payload, deterministic stub features
    * for everything else. Same seam, same output schema — downstream
    * code cannot tell which path produced a row (by design).
    */
  def extractImageFeaturesReal(df: DataFrame, payloadCol: String): DataFrame =
    extractImageFeatures(df, payloadCol, decodeImageOrStub)

  // -------------------------------------------------------------- audio

  /** Decoded-audio record produced by the audio decode stage. */
  final case class DecodedAudio(sampleRate: Int, channels: Int,
                                nSamples: Long, meanAbs: Double)

  /** STUB audio decode — the deterministic fallback for containers the
    * JDK parser rejects, hash-derived like [[decodeImageStub]] (same
    * digest input: the payload's uppercase hex).
    */
  def decodeAudioStub(payload: Array[Byte]): DecodedAudio = {
    val img = decodeImageStub(payload) // same stable hash-derived bytes
    val rates = Array(8000, 16000, 22050, 44100)
    DecodedAudio(rates(img.width % 4), 1 + img.height % 2,
      1000L + (img.width.toLong * img.height % 50000L), img.meanLuma)
  }

  /** REAL audio decode through the JDK's `javax.sound.sampled` (WAV/
    * AIFF/AU parsers ship with the JDK and need no audio device —
    * parsing is headless-safe). Returns None when no reader accepts the
    * payload or the format isn't 16-bit signed PCM (the lossless
    * round-trip contract q107 pins).
    *
    * Mean absolute amplitude mirrors the image path's luma discipline:
    * |sample| summed in a Long across all channels — exact and
    * order-independent — then ONE double division by
    * (totalSamples * 32768), so the result is bit-stable and
    * predictable by any engine that knows the PCM samples (WAV is
    * lossless, which is what makes q107 oracle-checkable).
    */
  def decodeAudioReal(payload: Array[Byte]): Option[DecodedAudio] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = in.getFormat
        val ok = fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian &&
          fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
        if (!ok) None
        else {
          val bytes = in.readAllBytes()
          val n = bytes.length / 2 // 16-bit samples across all channels
          var sum = 0L
          var i = 0
          while (i < n) {
            val s = ((bytes(2 * i) & 0xFF) | (bytes(2 * i + 1) << 8)).toShort
            sum += math.abs(s.toLong)
            i += 1
          }
          val channels = fmt.getChannels
          Some(DecodedAudio(fmt.getSampleRate.toInt, channels,
            n.toLong / channels, sum.toDouble / (n.toLong * 32768L)))
        }
      } finally in.close()
    } catch { case _: Exception => None }

  /** Real decode with declared stub fallback — the audio analog of
    * [[decodeImageOrStub]].
    */
  def decodeAudioOrStub(payload: Array[Byte]): DecodedAudio =
    decodeAudioReal(payload).getOrElse(decodeAudioStub(payload))

  /** Audio feature schema appended by `extractAudioFeatures`. */
  val AudioFeatureSchema: StructType = StructType(Seq(
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("n_samples", LongType),
    StructField("mean_abs", DoubleType)))

  /** Batched audio decode + feature extraction — the same
    * `mapPartitions` seam as [[extractImageFeatures]]: payloads are
    * DROPPED on the way out so the expensive bytes never cross the next
    * shuffle.
    */
  def extractAudioFeatures(df: DataFrame, payloadCol: String,
      decode: Array[Byte] => DecodedAudio = decodeAudioOrStub): DataFrame = {
    val inSchema = df.schema
    val payloadIdx = inSchema.fieldIndex(payloadCol)
    val keptIdx = inSchema.indices.filterNot(_ == payloadIdx)
    val outSchema = StructType(
      keptIdx.map(inSchema.fields(_)) ++ AudioFeatureSchema.fields)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val a = decode(r.getAs[Array[Byte]](payloadIdx))
        Row.fromSeq(keptIdx.map(r.get) ++
          Seq[Any](a.sampleRate, a.channels, a.nSamples, a.meanAbs))
      }
    }(enc)
  }

  /** Deterministic REAL WAV: 16-bit signed little-endian mono PCM whose
    * sample i is `floorMod(seed + 7919·i, 65536) − 32768`, wrapped in a
    * hand-assembled canonical 44-byte RIFF/WAVE header. PCM WAV is
    * lossless, so a decoder recovers these exact samples — the audio
    * analog of [[encodePngDeterministic]], and what lets q107 check the
    * real JDK audio decode against a SQL oracle that never touches a
    * codec.
    */
  def encodeWavDeterministic(seed: Long, nSamples: Int,
                             sampleRate: Int = 8000,
                             bumpS0: Int = 0): Array[Byte] = {
    val dataLen = nSamples * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2) // byte rate
      .putShort(2).putShort(16) // block align, bits
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < nSamples) {
      val bump = if (i == 0) bumpS0.toLong else 0L
      bb.putShort((Math.floorMod(seed + 7919L * i + bump, 65536L) - 32768L)
        .toShort)
      i += 1
    }
    bb.array
  }

  /** (id, payload) table of deterministic real WAVs, one per input row:
    * 400 + (id%3)·200 samples at 8 kHz — the audio twin of
    * [[syntheticRealPng]].
    */
  def syntheticRealWav(docs: DataFrame, idCol: String): DataFrame = {
    val ids = docs.select(col(idCol).cast("long").as("doc_id"))
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("payload", BinaryType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    ids.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        Row(id, encodeWavDeterministic(id, 400 + (id % 3).toInt * 200))
      }
    }(enc)
  }

  /** Sample rate parsed from the canonical WAV fmt chunk as a PURE
    * column expression (little-endian word at byte offset 24; bytes
    * reassembled in reverse for the hex→int conversion). NULL for
    * non-RIFF/WAVE payloads or ones shorter than the canonical header —
    * q107 cross-checks this against the full decode.
    */
  def wavHeaderSampleRate(payload: Column): Column =
    when(sniffFormat(payload) === "riff" &&
        substring(payload, 9, 4) === lit("WAVE".getBytes("US-ASCII")) &&
        length(payload) >= 44,
      conv(concat(
        hex(substring(payload, 28, 1)), hex(substring(payload, 27, 1)),
        hex(substring(payload, 26, 1)), hex(substring(payload, 25, 1))),
        16, 10).cast("long"))

  // ------------------------------------------------------------- resize

  /** STUB resize: a real implementation would scale pixels; here the
    * contract is the metadata transform (target box, preserved aspect) and
    * the pass-through of payload bytes. Fit = largest size inside
    * (maxW, maxH) preserving aspect ratio — standard thumbnail semantics.
    */
  def resizePlan(df: DataFrame, widthCol: String, heightCol: String,
                 maxW: Int, maxH: Int): DataFrame = {
    val scale = least(lit(maxW) / col(widthCol).cast("double"),
      lit(maxH) / col(heightCol).cast("double"), lit(1.0))
    df.withColumn("resized_width",
        greatest(round(col(widthCol) * scale).cast("int"), lit(1)))
      .withColumn("resized_height",
        greatest(round(col(heightCol) * scale).cast("int"), lit(1)))
  }

  // -------------------------------------------------------- frame sample

  /** Uniform frame sampling plan for video rows: emit one row per sampled
    * frame index (0-based, `n` frames uniformly spaced over `durationMs`).
    * Pure relational explode — the decode of each sampled frame would be a
    * follow-up `extractImageFeatures`-shaped pass.
    */
  def sampleFramePlan(df: DataFrame, durationMsCol: String, n: Int): DataFrame =
    df.withColumn("frame_idx", explode(sequence(lit(0), lit(n - 1))))
      .withColumn("frame_time_ms",
        (col("frame_idx") * col(durationMsCol) / n).cast("long"))

  // ------------------------------------------------- synthetic payloads

  /** Deterministic synthetic media payloads from the documents table:
    * text bytes wrapped with a real container magic chosen by doc_id.
    * Lets every multimodal operator be exercised (and oracle-checked) on
    * driver-provided data without shipping binary fixtures.
    */
  /** Deterministic REAL PNG: a w×h TYPE_INT_RGB image whose pixel (x,y)
    * is an affine-mod-256 function of the seed, encoded by the JDK PNG
    * writer. PNG is lossless, so a decoder recovers these exact values —
    * which is what lets q106 check the real ImageIO decode against a SQL
    * oracle that never touches a codec: the oracle predicts the
    * round-trip arithmetically from the seed.
    */
  def encodePngDeterministic(seed: Long, w: Int, h: Int,
                             bumpR00: Int = 0): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val bump = if (x == 0 && y == 0) bumpR00.toLong else 0L
        val r = Math.floorMod(seed + 7L * x + 13L * y + bump, 256L).toInt
        val g = Math.floorMod(3L * seed + 5L * x + 11L * y, 256L).toInt
        val b = Math.floorMod(7L * seed + 3L * x + 17L * y, 256L).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  // --------------------------------------------------- perceptual hash

  /** Deterministic REAL PNG with HASH-derived pixels: pixel (x, y) is
    * the GRAY value at byte x of `md5("{seed}:{y}")` (r = g = b — a
    * perceptual hash only sees luma, and one digest per ROW is 9× fewer
    * digest calls than one per pixel; the affine
    * [[encodePngDeterministic]] pattern is unusable here — its
    * near-constant column differences collapse every image onto a
    * handful of dHash values). `md5(string)` is the same function in
    * every engine, so a SQL oracle predicts each pixel as a hex-pair
    * substring. `bumpR00` adds to the (0,0) value (mod 256) — the
    * single-pixel near-dup perturbation. Requires w ≤ 16 (one digest
    * row).
    */
  def encodePngHashPixels(seed: Long, w: Int, h: Int,
                          bumpR00: Int = 0): Array[Byte] = {
    require(w <= 16, s"row-digest pixels support w <= 16, got $w")
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val md = java.security.MessageDigest.getInstance("MD5")
    var y = 0
    while (y < h) {
      val d = md.digest(s"$seed:$y".getBytes("UTF-8"))
      var x = 0
      while (x < w) {
        val bump = if (x == 0 && y == 0) bumpR00 else 0
        val v = ((d(x) & 0xFF) + bump) % 256
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** (id, payload) table of 9×8 real PNGs — the CANONICAL dHash
    * geometry (8 column comparisons × 8 rows = 64 bits) — with planted
    * near-duplicates: ids ≡ 1 (mod 8) reuse the PREVIOUS id's seed with
    * the (0,0) red channel bumped by one, so each (8k, 8k+1) pair is
    * visually near-identical (≤1 dHash bit apart from the single pixel)
    * while every other image's hash-derived pixels are effectively
    * random — unrelated pairs sit ~32 bits apart. The plant is
    * arithmetic over `md5`, so a SQL oracle predicts every hash — and
    * every near-dup verdict — without touching a codec (the q106
    * discipline).
    */
  def syntheticRealPngNearDups(docs: DataFrame, idCol: String): DataFrame = {
    val ids = docs.select(col(idCol).cast("long").as("doc_id"))
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("payload", BinaryType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    ids.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val near = id % 8 == 1
        val seed = if (near) id - 1 else id
        Row(id, encodePngHashPixels(seed, 9, 8,
          bumpR00 = if (near) 1 else 0))
      }
    }(enc)
  }

  /** Difference-hash bands from REAL decoded pixels: integer luma
    * 299·R + 587·G + 114·B per pixel, one bit per adjacent-column
    * comparison `luma(x+1,y) > luma(x,y)` over the first 8 rows × 8
    * comparisons, packed two rows per band into FOUR 16-bit band values
    * (banding is the hash's storage format — 4 bands of 16 bits is the
    * standard hamming-LSH layout: any pair within hamming 3 shares at
    * least one exact band). None when no ImageIO reader accepts the
    * payload or the image is smaller than 2×1.
    */
  def dhashBandsReal(payload: Array[Byte]): Option[Array[Long]] =
    if (payload == null) None
    else try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img == null || img.getWidth < 2 || img.getHeight < 1) None
      else Some(dhashOfImage(img))
      // NonFatal, not just IOException: ImageIO codecs throw runtime
      // exceptions (IndexOutOfBounds, IllegalArgument) on malformed-
      // but-claimed images, and the withDHashBands contract is that
      // undecodable rows are DROPPED, never task-fatal (the audio
      // bander already behaves this way).
    } catch { case scala.util.control.NonFatal(_) => None }

  /** The shared per-image dHash core ([[dhashBandsReal]] for stills,
    * [[dhashBandsFrames]] per animated frame). */
  private def dhashOfImage(img: java.awt.image.BufferedImage): Array[Long] = {
    def luma(x: Int, y: Int): Long = {
      val rgb = img.getRGB(x, y)
      299L * ((rgb >> 16) & 0xFF) + 587L * ((rgb >> 8) & 0xFF) +
        114L * (rgb & 0xFF)
    }
    val bands = new Array[Long](4)
    val rows = math.min(img.getHeight, 8)
    val cmps = math.min(img.getWidth - 1, 8)
    var y = 0
    while (y < rows) {
      var x = 0
      while (x < cmps) {
        if (luma(x + 1, y) > luma(x, y))
          bands(y / 2) |= 1L << ((y % 2) * 8 + x)
        x += 1
      }
      y += 1
    }
    bands
  }

  /** Per-frame dHash bands of an animated container (GIF via the JDK
    * reader) — one band array per frame, in frame order. None when no
    * reader accepts the payload or any frame is narrower than 2px.
    */
  def dhashBandsFrames(payload: Array[Byte]): Option[Seq[Array[Long]]] =
    if (payload == null) None
    else try {
      val in = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      val readers = javax.imageio.ImageIO.getImageReaders(in)
      if (!readers.hasNext) None
      else {
        val reader = readers.next()
        try {
          reader.setInput(in)
          val n = reader.getNumImages(true)
          val out = (0 until n).map(f => reader.read(f))
          if (out.exists(img => img.getWidth < 2 || img.getHeight < 1)) None
          else Some(out.map(dhashOfImage))
        } finally reader.dispose()
      }
      // NonFatal for the same reason as [[dhashBandsReal]]: codec
      // runtime exceptions on malformed payloads must DROP the row.
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Append perceptual-hash bands to a media table — the same
    * payload-dropping `mapPartitions` seam as [[extractImageFeatures]];
    * undecodable rows are DROPPED (a perceptual index has nothing to
    * say about them — route them through [[withMediaMeta]]'s content
    * hash instead). `bander` is the modality-specific hash
    * ([[dhashBandsReal]] for images, [[dhashBandsAudio]] for audio);
    * everything downstream ([[imageNearDupPairs]]) is
    * modality-agnostic over the (id, bands) relation.
    */
  def withDHashBands(df: DataFrame, payloadCol: String,
      bander: Array[Byte] => Option[Array[Long]]): DataFrame = {
    val inSchema = df.schema
    val payloadIdx = inSchema.fieldIndex(payloadCol)
    val keptIdx = inSchema.indices.filterNot(_ == payloadIdx)
    val outSchema = StructType(keptIdx.map(inSchema.fields(_)) :+
      StructField("bands", ArrayType(LongType, containsNull = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        bander(r.getAs[Array[Byte]](payloadIdx)).map { b =>
          Row.fromSeq(keptIdx.map(r.get) :+ b.toSeq)
        }
      }
    }(enc)
  }

  def withImageDHashBands(df: DataFrame, payloadCol: String): DataFrame =
    withDHashBands(df, payloadCol, dhashBandsReal)

  def withAudioDHashBands(df: DataFrame, payloadCol: String): DataFrame =
    withDHashBands(df, payloadCol, dhashBandsAudio)

  /** Waveform difference-hash from REAL decoded PCM: the audio analog
    * of [[dhashBandsReal]] — 65 equal-span block means of the sample
    * stream (integer division TRUNCATING toward zero on the
    * possibly-negative sums: Scala Long `/` ≡ DuckDB's integer `//`,
    * which truncates, NOT floors — measured -7//2 = -3 there, so a
    * Math.floorDiv here would drift one unit on negative odd-sum
    * blocks and latently flip hash bits), one bit per adjacent-block
    * comparison
    * `mean(b+1) > mean(b)`, 64 bits packed as 4×16-bit bands (block b's
    * comparison lands in band b/16, bit b%16). None when no reader
    * accepts the payload, it isn't 16-bit little-endian PCM, or it has
    * fewer than 66 samples.
    */
  def dhashBandsAudio(payload: Array[Byte]): Option[Array[Long]] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = in.getFormat
        val ok = fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian &&
          fmt.getEncoding ==
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
        if (!ok) None
        else {
          val bytes = in.readAllBytes()
          val n = bytes.length / 2
          if (n < 66) None
          else {
            def sample(i: Int): Long =
              ((bytes(2 * i) & 0xFF) | (bytes(2 * i + 1) << 8)).toShort.toLong
            val means = new Array[Long](65)
            var b = 0
            while (b < 65) {
              val lo = b * n / 65
              val hi = (b + 1) * n / 65
              var sum = 0L
              var i = lo
              while (i < hi) { sum += sample(i); i += 1 }
              means(b) = sum / (hi - lo)
              b += 1
            }
            val bands = new Array[Long](4)
            var c = 0
            while (c < 64) {
              if (means(c + 1) > means(c)) bands(c / 16) |= 1L << (c % 16)
              c += 1
            }
            Some(bands)
          }
        }
      } finally in.close()
    } catch { case _: Exception => None }

  /** Deterministic real WAV with HASH-derived samples: sample i is the
    * 16-bit word at byte offset 2·(i mod 8) of `md5("{seed}:{i div 8}")`
    * minus 32768 — one digest per EIGHT samples (the mod-linear
    * [[encodeWavDeterministic]] stream differs across seeds only by a
    * constant shift, which collapses every clip onto near-identical
    * block-difference hashes; per-sample digests would cost 8× more).
    * `bumpS0` perturbs sample 0 inside the 16-bit mod. SQL predicts
    * every sample via the same md5 + hex-substring arithmetic.
    */
  def encodeWavHashSamples(seed: Long, nSamples: Int,
                           sampleRate: Int = 8000,
                           bumpS0: Int = 0): Array[Byte] = {
    val dataLen = nSamples * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2)
      .putShort(2).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    val md = java.security.MessageDigest.getInstance("MD5")
    var d: Array[Byte] = null
    var i = 0
    while (i < nSamples) {
      if (i % 8 == 0) d = md.digest(s"$seed:${i / 8}".getBytes("UTF-8"))
      val o = 2 * (i % 8)
      val raw = ((d(o) & 0xFF) << 8) | (d(o + 1) & 0xFF)
      val bump = if (i == 0) bumpS0 else 0
      bb.putShort((Math.floorMod(raw + bump, 65536) - 32768).toShort)
      i += 1
    }
    bb.array
  }

  /** (id, payload) table of real WAVs with planted near-duplicates —
    * the audio twin of [[syntheticRealPngNearDups]]: ids ≡ 1 (mod 8)
    * reuse the previous id's seed with sample 0 bumped inside the
    * 16-bit mod, so each (8k, 8k+1) pair differs in ONE sample (≤1
    * waveform-dHash bit) while other seeds' md5-derived block means
    * spread pseudo-randomly. Sample counts derive from the SEED (400 +
    * (seed%3)·200) so pair members align sample-for-sample; PCM
    * losslessness makes every hash SQL-predictable.
    */
  def syntheticRealWavNearDups(docs: DataFrame, idCol: String): DataFrame = {
    val ids = docs.select(col(idCol).cast("long").as("doc_id"))
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("payload", BinaryType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    ids.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val near = id % 8 == 1
        val seed = if (near) id - 1 else id
        Row(id, encodeWavHashSamples(seed,
          400 + (seed % 3).toInt * 200, bumpS0 = if (near) 1 else 0))
      }
    }(enc)
  }

  /** Perceptual near-duplicate pairs from a banded-dHash table: exact
    * band equality generates candidates (the hamming-LSH guarantee:
    * hamming ≤ 3 ⇒ ≥1 shared band), oversized band buckets are dropped
    * under `maxBucketSize` (the `Dedup.lshNearDup` cap — a degenerate
    * bucket, e.g. all-flat images, would otherwise go quadratic; the
    * cap is the documented recall trade), and candidates verify by
    * exact hamming over the 4 bands. Shuffles carry (band, value) and
    * id pairs — never pixels, never payloads.
    *
    * Returns (id_a, id_b, hamming), id_a < id_b, hamming ≤ maxHamming.
    */
  def imageNearDupPairs(withBands: DataFrame, idCol: String,
                        maxHamming: Int,
                        maxBucketSize: Int = 1000): DataFrame = {
    require(maxHamming >= 0 && maxBucketSize > 0,
      s"bad maxHamming/maxBucketSize: $maxHamming/$maxBucketSize")
    val bands = withBands.select(col(idCol),
      posexplode(col("bands")).as(Seq("band_idx", "val")))
    // cap as a count aggregate + semi-join (map-side combining) — a
    // window would buffer a hot band bucket's members on one task
    val capped = bands.join(
      bands.groupBy(col("band_idx"), col("val"))
        .agg(count(lit(1)).as("__n"))
        .filter(col("__n") <= maxBucketSize)
        .select(col("band_idx"), col("val")),
      Seq("band_idx", "val"), "left_semi")
    val cands = capped.as("x")
      .join(capped.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
          col("x.val") === col("y.val") &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("id_a"), col(s"y.$idCol").as("id_b"))
      .distinct()
    cands
      .join(withBands.select(col(idCol).as("id_a"),
        col("bands").as("__ba")), Seq("id_a"))
      .join(withBands.select(col(idCol).as("id_b"),
        col("bands").as("__bb")), Seq("id_b"))
      .withColumn("hamming", expr(
        "aggregate(zip_with(__ba, __bb, (x, y) -> bit_count(x ^ y)), " +
          "0L, (acc, v) -> acc + CAST(v AS BIGINT))"))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Persist a banded-dHash corpus as a probeable index — the
    * perceptual-dedup member of the persisted-index family
    * (`Dedup.writeMinhashIndex`, `Retrieval.writeBm25Index`): `table`
    * holds the exploded (band_idx, val, id) postings bucketed+sorted by
    * val; `<table>_bands` the (id, bands) arrays bucketed by id for the
    * verify join. Payloads are NOT stored — the index answers near-dup
    * questions from hashes alone.
    */
  def writeDHashIndex(banded: DataFrame, idCol: String, table: String,
                      nBuckets: Int = 32): Unit = {
    banded.select(col(idCol),
        posexplode(col("bands")).as(Seq("band_idx", "val")))
      .write.format("parquet")
      .bucketBy(nBuckets, "val").sortBy("val", idCol)
      .mode("overwrite").saveAsTable(table)
    banded.select(col(idCol), col("bands"))
      .write.format("parquet")
      .bucketBy(nBuckets, idCol).sortBy(idCol)
      .mode("overwrite").saveAsTable(s"${table}_bands")
  }

  /** Append a banded batch to a persisted dHash index — the corpus
    * growth step of the ingest loop (the `appendToMinhashIndex`
    * pattern): postings and bands append atomically-enough for the
    * micro-batch cadence (each batch is one append of each table).
    */
  def appendToDHashIndex(banded: DataFrame, idCol: String,
                         table: String): Unit = {
    // insertInto (positional) honors the existing tables' bucketing
    // metadata — saveAsTable(append) would reject the bucketed target
    banded.select(col(idCol),
        posexplode(col("bands")).as(Seq("band_idx", "val")))
      .write.mode("append").insertInto(table)
    banded.select(col(idCol), col("bands"))
      .write.mode("append").insertInto(s"${table}_bands")
  }

  /** Probe a persisted dHash index with a banded BATCH: band-equality
    * candidates against the indexed postings (batch side broadcasts —
    * the corpus postings scan once and never shuffle), bucket cap on
    * the INDEX side's band values, exact hamming verify via the stored
    * bands. Returns (probe_id, corpus_id, hamming) with hamming ≤
    * maxHamming. Results are per-probe-document against a static
    * corpus, so the union of per-batch outputs equals one probe of
    * everything batched (spec-pinned — what makes the streaming loop
    * pure).
    */
  def dhashProbeIndexed(spark: org.apache.spark.sql.SparkSession,
                        table: String, banded: DataFrame, idCol: String,
                        maxHamming: Int,
                        maxBucketSize: Int = 1000): DataFrame = {
    require(maxHamming >= 0 && maxBucketSize > 0,
      s"bad maxHamming/maxBucketSize: $maxHamming/$maxBucketSize")
    // band-geometry guard (the MinhashMeta rationale applied to the
    // pre-banded contract): an index built from B-band hashes probed
    // with a differently-banded batch never errors, it just never
    // matches. The geometry is implicit in the stored bands sidecar —
    // check one row of each side before probing, fail loudly.
    val idxNb = spark.table(s"${table}_bands")
      .select(size(col("bands"))).limit(1).collect()
      .headOption.map(_.getInt(0))
    val batchNb = banded.select(size(col("bands"))).limit(1).collect()
      .headOption.map(_.getInt(0))
    for (i <- idxNb; b <- batchNb)
      require(i == b,
        s"probe batch carries $b-band hashes but index $table stores " +
          s"$i-band hashes — a different bander family (silent " +
          s"zero-match corruption). Re-band the batch with the index's " +
          s"bander.")
    val postings = spark.table(table)
    // same cap-as-aggregate shape; the bucketed postings scan feeds
    // both sides without a corpus exchange
    val capped = postings.join(
      postings.groupBy(col("band_idx"), col("val"))
        .agg(count(lit(1)).as("__n"))
        .filter(col("__n") <= maxBucketSize)
        .select(col("band_idx"), col("val")),
      Seq("band_idx", "val"), "left_semi")
    val probe = banded.select(col(idCol).as("probe_id"),
      posexplode(col("bands")).as(Seq("band_idx", "val")))
    val cands = capped
      .join(broadcast(probe), Seq("band_idx", "val"))
      .select(col("probe_id"), col(idCol).as("corpus_id"))
      .distinct()
    cands
      .join(broadcast(banded.select(col(idCol).as("probe_id"),
        col("bands").as("__pb"))), Seq("probe_id"))
      .join(spark.table(s"${table}_bands")
        .select(col(idCol).as("corpus_id"), col("bands").as("__cb")),
        Seq("corpus_id"))
      .withColumn("hamming", expr(
        "aggregate(zip_with(__pb, __cb, (x, y) -> bit_count(x ^ y)), " +
          "0L, (acc, v) -> acc + CAST(v AS BIGINT))"))
      .filter(col("hamming") <= maxHamming)
      .select(col("probe_id"), col("corpus_id"), col("hamming"))
  }

  /** Probe a persisted FRAME-level dHash index with a frame-banded
    * batch and roll the frame hits up to CLIP pairs — the video member
    * of the probe family. The index is [[writeDHashIndex]] over
    * [[withFrameDHashBands]] output keyed by the CLIP id (postings and
    * bands then simply hold one row per frame under the clip's key),
    * and the frame-level probe is [[dhashProbeIndexed]] VERBATIM: its
    * candidate join hits any colliding frame band, and its verify join
    * — probe bands × stored bands under the candidate pair — is
    * exactly the all-frame-pairs hamming [[videoNearDupPairs]]
    * computes. This roll-up then mirrors that operator's clip
    * contract: `best_hamming` = the closest qualifying frame pair,
    * `n_frame_matches` = how many frame pairs met the gate.
    *
    * Same scale shape as the image probe: the corpus never shuffles,
    * the batch broadcasts, and only (band, value) keys + clip/frame
    * ids move — never pixels.
    */
  def videoNearDupProbeIndexed(spark: org.apache.spark.sql.SparkSession,
                               table: String, framesBanded: DataFrame,
                               idCol: String, maxHamming: Int,
                               maxBucketSize: Int = 1000): DataFrame =
    dhashProbeIndexed(spark, table,
        framesBanded.select(col(idCol), col("bands")), idCol,
        maxHamming, maxBucketSize)
      .groupBy(col("probe_id"), col("corpus_id"))
      .agg(min(col("hamming")).as("best_hamming"),
        count(lit(1)).as("n_frame_matches"))

  /** Deterministic real animated GIF with HASH-derived grayscale
    * pixels: frame f's sample at (x, y) is byte x of
    * `md5("{seed}:{f}:{y}")` — one digest per frame ROW (9× fewer than
    * per-pixel), the identity 256-gray palette keeping the round-trip
    * lossless (the q108 discipline), md5 giving every frame an
    * effectively random dHash. `bumpF0` perturbs frame 0's (0,0)
    * sample inside the mod. Requires w ≤ 16.
    */
  def encodeGifHashPixels(seed: Long, w: Int, h: Int, nFrames: Int,
                          bumpF0: Int = 0): Array[Byte] = {
    require(w <= 16, s"row-digest pixels support w <= 16, got $w")
    val gray = Array.tabulate(256)(_.toByte)
    val cm = new java.awt.image.IndexColorModel(8, 256, gray, gray, gray)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer =
      javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val md = java.security.MessageDigest.getInstance("MD5")
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < nFrames) {
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
        val raster = img.getRaster
        var y = 0
        while (y < h) {
          val d = md.digest(s"$seed:$f:$y".getBytes("UTF-8"))
          var x = 0
          while (x < w) {
            val bump =
              if (f == 0 && x == 0 && y == 0) bumpF0 else 0
            raster.setSample(x, y, 0, ((d(x) & 0xFF) + bump) % 256)
            x += 1
          }
          y += 1
        }
        writer.writeToSequence(
          new javax.imageio.IIOImage(img, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  /** (id, payload) table of 9×8 animated GIFs with planted
    * near-duplicate CLIPS: ids ≡ 1 (mod 8) reuse the previous id's seed
    * with frame 0's corner sample bumped — every other frame is
    * bit-identical between pair members, frame 0 differs by ≤1 dHash
    * bit. Frame counts derive from the SEED (2 + seed%3) so pairs align
    * frame-for-frame.
    */
  def syntheticRealGifNearDups(docs: DataFrame, idCol: String): DataFrame = {
    val ids = docs.select(col(idCol).cast("long").as("doc_id"))
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("payload", BinaryType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    ids.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val near = id % 8 == 1
        val seed = if (near) id - 1 else id
        Row(id, encodeGifHashPixels(seed, 9, 8,
          2 + (seed % 3).toInt, bumpF0 = if (near) 1 else 0))
      }
    }(enc)
  }

  /** Per-frame banded dHash of an animated-media table — one output row
    * PER FRAME (idCol, frame_idx, bands), the payload-dropping seam of
    * [[withDHashBands]] with the frame explosion inside it. Undecodable
    * payloads drop.
    */
  def withFrameDHashBands(df: DataFrame, payloadCol: String): DataFrame = {
    val inSchema = df.schema
    val payloadIdx = inSchema.fieldIndex(payloadCol)
    val keptIdx = inSchema.indices.filterNot(_ == payloadIdx)
    val outSchema = StructType(keptIdx.map(inSchema.fields(_)) ++ Seq(
      StructField("frame_idx", IntegerType),
      StructField("bands", ArrayType(LongType, containsNull = false))))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        dhashBandsFrames(r.getAs[Array[Byte]](payloadIdx)).toSeq.flatMap {
          frames =>
            frames.zipWithIndex.map { case (b, f) =>
              Row.fromSeq(keptIdx.map(r.get) ++ Seq(f, b.toSeq))
            }
        }
      }
    }(enc)
  }

  /** Clip-level near-duplicates from per-frame bands: frame-level
    * band-equality candidates (capped buckets), exact per-frame-pair
    * hamming, then a roll-up per clip pair — `best_hamming` is the
    * closest qualifying frame pair, `n_frame_matches` how many frame
    * pairs met the gate. The frame-sampled video-dedup shape: two clips
    * are near-dups when ANY of their frames perceptually collide.
    * Same-clip frame pairs are excluded.
    */
  def videoNearDupPairs(framesBanded: DataFrame, idCol: String,
                        frameCol: String, maxHamming: Int,
                        maxBucketSize: Int = 1000): DataFrame = {
    require(maxHamming >= 0 && maxBucketSize > 0,
      s"bad maxHamming/maxBucketSize: $maxHamming/$maxBucketSize")
    val bands = framesBanded.select(col(idCol), col(frameCol),
      posexplode(col("bands")).as(Seq("band_idx", "val")))
    // cap as a count aggregate + semi-join (map-side combining) — a
    // window would buffer a hot band bucket's members on one task
    val capped = bands.join(
      bands.groupBy(col("band_idx"), col("val"))
        .agg(count(lit(1)).as("__n"))
        .filter(col("__n") <= maxBucketSize)
        .select(col("band_idx"), col("val")),
      Seq("band_idx", "val"), "left_semi")
    val cands = capped.as("x")
      .join(capped.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
          col("x.val") === col("y.val") &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("id_a"), col(s"x.$frameCol").as("f_a"),
        col(s"y.$idCol").as("id_b"), col(s"y.$frameCol").as("f_b"))
      .distinct()
    cands
      .join(framesBanded.select(col(idCol).as("id_a"),
        col(frameCol).as("f_a"), col("bands").as("__ba")), Seq("id_a", "f_a"))
      .join(framesBanded.select(col(idCol).as("id_b"),
        col(frameCol).as("f_b"), col("bands").as("__bb")), Seq("id_b", "f_b"))
      .withColumn("hamming", expr(
        "aggregate(zip_with(__ba, __bb, (x, y) -> bit_count(x ^ y)), " +
          "0L, (acc, v) -> acc + CAST(v AS BIGINT))"))
      .filter(col("hamming") <= maxHamming)
      .groupBy(col("id_a"), col("id_b"))
      .agg(min(col("hamming")).as("best_hamming"),
        count(lit(1)).as("n_frame_matches"))
  }

  /** (id, payload) table of deterministic real PNGs, one per input row:
    * dims 8+(id%5) × 8+(id%3), pixels from `encodePngDeterministic(id)`.
    * Encode runs in the same batched `mapPartitions` shape as decode —
    * payload bytes are born at the edge of the plan, never shuffled in.
    */
  def syntheticRealPng(docs: DataFrame, idCol: String): DataFrame = {
    val ids = docs.select(col(idCol).cast("long").as("doc_id"))
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("payload", BinaryType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    ids.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val w = 8 + (id % 5).toInt
        val h = 8 + (id % 3).toInt
        Row(id, encodePngDeterministic(id, w, h))
      }
    }(enc)
  }

  /** Frame-level feature extraction for animated containers: one output
    * row PER FRAME (doc rows explode by their stored frame count), same
    * payload-dropping `mapPartitions` seam as the still-image path.
    * Output schema = input columns (minus payload) + frame_idx +
    * ImageFeatureSchema minus aspect (kept lean). Payloads ImageIO
    * cannot parse yield ONE stub row with frame_idx 0 — total like the
    * other decoders.
    */
  def extractFrameFeatures(df: DataFrame, payloadCol: String): DataFrame = {
    val inSchema = df.schema
    val payloadIdx = inSchema.fieldIndex(payloadCol)
    val keptIdx = inSchema.indices.filterNot(_ == payloadIdx)
    val outSchema = StructType(
      keptIdx.map(inSchema.fields(_)) ++ Seq(
        StructField("frame_idx", IntegerType),
        StructField("width", IntegerType),
        StructField("height", IntegerType),
        StructField("mean_luma", DoubleType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        val frames = decodeImageFramesReal(payload)
          .getOrElse(Seq(decodeImageStub(payload)))
        val kept = keptIdx.map(r.get)
        frames.zipWithIndex.map { case (f, i) =>
          Row.fromSeq(kept ++ Seq[Any](i, f.width, f.height, f.meanLuma))
        }
      }
    }(enc)
  }

  /** Deterministic REAL animated GIF: `nFrames` w×h frames of
    * TYPE_BYTE_INDEXED pixels over an identity GRAYSCALE palette —
    * pixel (x,y) of frame f holds gray level
    * `floorMod(seed + 7x + 13y + 31f, 256)`. Grayscale is the trick
    * that makes the round trip lossless no matter what the GIF writer
    * does to palette ORDER: a reader recovers the colors, and every
    * gray color maps back to exactly one level, so the decoded luma is
    * `level/255` exactly (the Rec.601 milli-weights sum to 1000). That
    * is what lets q108 oracle-check frame-level decode arithmetic.
    */
  def encodeGifDeterministic(seed: Long, w: Int, h: Int,
                             nFrames: Int): Array[Byte] = {
    val gray = Array.tabulate(256)(_.toByte)
    val cm = new java.awt.image.IndexColorModel(8, 256, gray, gray, gray)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < nFrames) {
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
        val raster = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            raster.setSample(x, y, 0,
              Math.floorMod(seed + 7L * x + 13L * y + 31L * f, 256L).toInt)
            x += 1
          }
          y += 1
        }
        writer.writeToSequence(
          new javax.imageio.IIOImage(img, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  /** (id, payload) table of deterministic real animated GIFs: dims
    * 8+(id%5) × 8+(id%3), 2+(id%3) frames — the multi-frame twin of
    * [[syntheticRealPng]]/[[syntheticRealWav]].
    */
  def syntheticRealGif(docs: DataFrame, idCol: String): DataFrame = {
    val ids = docs.select(col(idCol).cast("long").as("doc_id"))
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("payload", BinaryType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    ids.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        Row(id, encodeGifDeterministic(id, 8 + (id % 5).toInt,
          8 + (id % 3).toInt, 2 + (id % 3).toInt))
      }
    }(enc)
  }

  /** Width/height parsed from the PNG IHDR chunk as a PURE column
    * expression (no decode, no UDF, codegen'd): the spec fixes IHDR as
    * the first chunk, so width is the big-endian word at byte offset 16
    * and height at 20. NULL when the payload isn't a PNG or is shorter
    * than the 24-byte header — callers cross-check these against the
    * full decode (q106 does, and the oracle confirms both).
    */
  def pngHeaderWidth(payload: Column): Column = pngHeaderWord(payload, 17)
  def pngHeaderHeight(payload: Column): Column = pngHeaderWord(payload, 21)

  private def pngHeaderWord(payload: Column, pos1Based: Int): Column =
    when(sniffFormat(payload) === "png" && length(payload) >= 24,
      conv(hex(substring(payload, pos1Based, 4)), 16, 10).cast("long"))

  def syntheticMedia(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val utf8 = encode(col(textCol), "UTF-8")
    val png = lit(Magics(0)._1)
    val jpeg = lit(Magics(1)._1)
    docs.withColumn("payload",
      when(col(idCol) % 3 === 0, concat(png, utf8))
        .when(col(idCol) % 3 === 1, concat(jpeg, utf8))
        .otherwise(utf8))
  }
}
