package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) columns for training-data pipelines.
  *
  * Media travel as opaque `binary` columns plus typed metadata — the only
  * representation that scales: payloads stay columnar/compressed in
  * parquet, metadata is pushdown-filterable, and decode happens ONLY in
  * explicitly batched operators at the edge of the plan.
  *
  * Container constraint: no image/audio codec libraries are available, so
  * `decodeImageStub` is a clearly-marked deterministic fake (shape, batch
  * contract, and schema are real; pixel math is hash-derived). Swapping in
  * a real codec changes one function body and nothing else.
  */
object Multimodal {

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
  def extractImageFeatures(df: DataFrame, payloadCol: String): DataFrame = {
    val inSchema = df.schema
    val payloadIdx = inSchema.fieldIndex(payloadCol)
    val keptIdx = inSchema.indices.filterNot(_ == payloadIdx)
    val outSchema = StructType(
      keptIdx.map(inSchema.fields(_)) ++ ImageFeatureSchema.fields)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      // per-partition init for a real decoder would go here
      rows.map { r =>
        val img = decodeImageStub(r.getAs[Array[Byte]](payloadIdx))
        // Seq[Any] — a plain Seq would unify Int/Double and silently widen
        // the Int fields, breaking the declared IntegerType schema
        Row.fromSeq(
          keptIdx.map(r.get) ++ Seq[Any](img.width, img.height, img.channels,
            img.meanLuma, img.width.toDouble / img.height))
      }
    }(enc)
  }

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
