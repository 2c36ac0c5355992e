package graft.entry

/** Multimodal (image/audio/video) metadata, features,
  * real-codec decode, and perceptual near-dup.
  *
  * One slice of [[graft.SparkEntry]]'s catalog: `queries` and the
  * matching DuckDB `oracleSql` live side by side so an edit to a
  * query and its oracle is always a same-file change.
  */
import graft.entry.EntryTables._
import graft.ext.{Dedup, Multimodal, Retrieval, Similarity, TextOps}
import graft.model.{ColumnSpec, FkRef, TableConfig}
import graft.ops.{Merge, Normalize, TemporalJoin}
import graft.rules.Rules
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

private[graft] object MediaQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- perceptual image near-dup (oracle-checked, REAL decode):
    // dHash over real ImageIO pixels in the canonical 9×8 geometry,
    // stored as 4×16-bit bands; band equality generates candidates
    // (hamming-LSH), exact hamming verifies. Near-dups are planted
    // arithmetically ((8k, 8k+1) share a seed, one pixel bumped), so
    // the oracle predicts every hash and verdict without a codec.
    "q131_image_near_dup" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select("doc_id")
      val media = Multimodal.syntheticRealPngNearDups(docs, "doc_id")
      // the pair join reads the banded relation three times (explode +
      // both verify sides) — checkpoint the (id, 4-long) rows once so
      // the encode+decode seam doesn't run per consumer
      val banded = Multimodal.withImageDHashBands(media, "payload")
        .localCheckpoint()
      Multimodal.imageNearDupPairs(banded, "doc_id", maxHamming = 10)
        .orderBy("id_a", "id_b")
    }),

    // ---- perceptual audio near-dup (oracle-checked, REAL decode):
    // q131's band machinery over a waveform dHash — 65 block means of
    // the real decoded PCM (floor division, exact), adjacent-block
    // comparison bits in 4×16-bit bands; the near-dup pipeline
    // (band-equality candidates → capped buckets → exact hamming) is
    // SHARED with the image path, modality-agnostic over (id, bands).
    "q132_audio_near_dup" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select("doc_id")
      val media = Multimodal.syntheticRealWavNearDups(docs, "doc_id")
      val banded = Multimodal.withAudioDHashBands(media, "payload")
        .localCheckpoint() // q131's rationale: decode once, not 3×
      Multimodal.imageNearDupPairs(banded, "doc_id", maxHamming = 10)
        .orderBy("id_a", "id_b")
    }),

    // ---- perceptual video near-dup (oracle-checked, REAL decode):
    // frame-sampled clip dedup — per-frame dHash over real decoded GIF
    // frames (lossless identity-gray palette), frame-level band
    // candidates, exact per-frame-pair hamming, clip-level roll-up
    // (best frame pair + match count). Planted (8k, 8k+1) clips share
    // every frame except a one-sample bump in frame 0.
    "q133_video_near_dup" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select("doc_id")
      val media = Multimodal.syntheticRealGifNearDups(docs, "doc_id")
      val framed = Multimodal.withFrameDHashBands(media, "payload")
        .localCheckpoint() // q131's rationale: decode once, not 3×
      Multimodal.videoNearDupPairs(framed, "doc_id", "frame_idx",
          maxHamming = 10)
        .orderBy("id_a", "id_b")
    }),

    // ---- multimodal: binary payloads, metadata + format sniffing ------------
    "q35_media_meta" -> ((s, dir) => {
      val media = Multimodal.syntheticMedia(t(s, dir, "documents"),
        "doc_id", "text")
      Multimodal.withMediaMeta(media, "payload")
        .select(col("doc_id"), col("n_bytes").cast("long").as("n_bytes"),
          col("format"))
        .orderBy("doc_id")
    }),

    // ---- multimodal: batched decode + feature extraction (oracle-checked:
    // the stub digest input is hex(payload), so the full feature vector —
    // dims, channels, luma, resize box — reproduces as sha256(hex(..))
    // arithmetic in DuckDB) ---------------------------------------------------
    "q36_image_features" -> ((s, dir) => {
      val media = Multimodal.syntheticMedia(t(s, dir, "documents"),
          "doc_id", "text")
        .select("doc_id", "payload")
      val feats = Multimodal.extractImageFeatures(media, "payload")
      Multimodal.resizePlan(feats, "width", "height", maxW = 256, maxH = 256)
        .select("doc_id", "width", "height", "channels", "mean_luma",
          "resized_width", "resized_height")
        .orderBy("doc_id")
    }),

    // ---- multimodal: REAL ImageIO decode (oracle-checked by round-trip
    // prediction): Spark encodes deterministic PNGs (affine-mod-256
    // pixels), decodes them back through the JDK's javax.imageio, and
    // reports header-parsed dims (IHDR words, pure codegen — no decode)
    // next to decoded dims and the exact-integer-sum mean luma. PNG is
    // lossless, so DuckDB predicts every value arithmetically from
    // doc_id without touching a codec — hash parity proves real pixels
    // were decoded, not stubbed.
    "q106_image_features_imageio" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select("doc_id")
        .filter(col("doc_id") % 4 === 0)
      val media = Multimodal.syntheticRealPng(docs, "doc_id")
        .withColumn("header_width", Multimodal.pngHeaderWidth(col("payload")))
        .withColumn("header_height", Multimodal.pngHeaderHeight(col("payload")))
      Multimodal.extractImageFeaturesReal(media, "payload")
        .select(col("doc_id"), col("header_width"), col("header_height"),
          col("width"), col("height"), col("channels"), col("mean_luma"))
        .orderBy("doc_id")
    }),

    // ---- multimodal: REAL JDK audio decode (oracle-checked by round-trip
    // prediction, the audio twin of q106): Spark assembles deterministic
    // 16-bit PCM WAVs, decodes them back through javax.sound.sampled,
    // and reports the header-parsed sample rate (pure codegen) next to
    // decoded format, sample count, duration, and exact-integer mean
    // amplitude. PCM is lossless → DuckDB predicts every value from
    // doc_id without touching an audio library.
    "q107_audio_features_wav" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select("doc_id")
        .filter(col("doc_id") % 4 === 1)
      val media = Multimodal.syntheticRealWav(docs, "doc_id")
        .withColumn("header_sample_rate",
          Multimodal.wavHeaderSampleRate(col("payload")))
      Multimodal.extractAudioFeatures(media, "payload",
          Multimodal.decodeAudioOrStub)
        .withColumn("duration_ms", call_function("div",
          col("n_samples") * lit(1000L), col("sample_rate").cast("long")))
        .select(col("doc_id"), col("header_sample_rate"), col("sample_rate"),
          col("channels"), col("n_samples"), col("duration_ms"),
          col("mean_abs"))
        .orderBy("doc_id")
    }),

    // ---- multimodal: REAL multi-frame decode (oracle-checked by
    // round-trip prediction — the video-shaped member of the q106/q107
    // family): Spark writes deterministic animated GIFs over an identity
    // grayscale palette (lossless regardless of writer palette order),
    // decodes every stored frame back through the JDK GIF reader, and
    // emits one row per frame. DuckDB predicts each frame's dims and
    // exact mean luma arithmetically from doc_id.
    "q108_video_frames_gif" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select("doc_id")
        .filter(col("doc_id") % 4 === 2)
      val media = Multimodal.syntheticRealGif(docs, "doc_id")
      Multimodal.extractFrameFeatures(media, "payload")
        .select(col("doc_id"), col("frame_idx"), col("width"),
          col("height"), col("mean_luma"))
        .orderBy("doc_id", "frame_idx")
    }),

    // ---- multimodal: uniform frame-sampling plan -----------------------------
    "q39_frame_sample" -> ((s, dir) => {
      val videos = t(s, dir, "documents")
        .filter(col("doc_id") % 50 === 0)
        // duration divisible by the sample count => frame times exact in
        // both engines (no float-rounding divergence)
        .withColumn("duration_ms", col("n_chars") * 800)
      Multimodal.sampleFramePlan(videos, "duration_ms", n = 8)
        .select("doc_id", "duration_ms", "frame_idx", "frame_time_ms")
        .orderBy("doc_id", "frame_idx")
    }),
  )

  val oracleSql: Map[String, String] = Map(

    // payload = magic || utf8(text), magic by doc_id % 3 (mirrors
    // Multimodal.syntheticMedia); sniffing compares hex prefixes — same
    // longest-first cascade as Multimodal.sniffFormat.
    "q35_media_meta" ->
      """WITH media AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN '\x89\x50\x4E\x47'::BLOB || encode(text)
        |         WHEN doc_id % 3 = 1 THEN '\xFF\xD8\xFF'::BLOB || encode(text)
        |         ELSE encode(text) END AS payload
        |  FROM documents)
        |SELECT doc_id, octet_length(payload) AS n_bytes,
        |  CASE WHEN substr(hex(payload), 1, 8) = '89504E47' THEN 'png'
        |       WHEN substr(hex(payload), 1, 6) = 'FFD8FF' THEN 'jpeg'
        |       WHEN substr(hex(payload), 1, 8) = '52494646' THEN 'riff'
        |       WHEN substr(hex(payload), 1, 6) = '494433' THEN 'mp3'
        |       WHEN substr(hex(payload), 1, 8) = '4F676753' THEN 'ogg'
        |       WHEN substr(hex(payload), 1, 8) = '1A45DFA3' THEN 'mkv'
        |       ELSE 'unknown' END AS format
        |FROM media ORDER BY doc_id""".stripMargin,

    // the stub decode, digit for digit: u_i = byte i of
    // sha256(hex(payload)) (the stub digests the uppercase hex — hex() is
    // uppercase in both engines), then the same modular arithmetic and
    // thumbnail-fit resize. Pure IEEE ops, so doubles are bit-identical.
    "q36_image_features" ->
      """WITH media AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN '\x89\x50\x4E\x47'::BLOB || encode(text)
        |         WHEN doc_id % 3 = 1 THEN '\xFF\xD8\xFF'::BLOB || encode(text)
        |         ELSE encode(text) END AS payload
        |  FROM documents),
        |u AS (
        |  SELECT doc_id, sha256(hex(payload)) AS d FROM media),
        |bytes AS (
        |  SELECT doc_id,
        |    ('0x' || substr(d, 1, 2))::BIGINT AS u0,
        |    ('0x' || substr(d, 3, 2))::BIGINT AS u1,
        |    ('0x' || substr(d, 5, 2))::BIGINT AS u2,
        |    ('0x' || substr(d, 7, 2))::BIGINT AS u3,
        |    ('0x' || substr(d, 9, 2))::BIGINT AS u4,
        |    ('0x' || substr(d, 11, 2))::BIGINT AS u5,
        |    ('0x' || substr(d, 13, 2))::BIGINT AS u6
        |  FROM u),
        |feat AS (
        |  SELECT doc_id,
        |    CAST(64 + ((u0 * 256 + u1) % 1857) AS INT) AS width,
        |    CAST(64 + ((u2 * 256 + u3) % 1017) AS INT) AS height,
        |    CAST(CASE WHEN u4 % 4 = 0 THEN 1 ELSE 3 END AS INT) AS channels,
        |    (u5 * 256 + u6) / 65535.0 AS mean_luma
        |  FROM bytes)
        |SELECT doc_id, width, height, channels, mean_luma,
        |  CAST(greatest(round(
        |    width * least(256.0 / width, 256.0 / height, 1.0)), 1) AS INT)
        |    AS resized_width,
        |  CAST(greatest(round(
        |    height * least(256.0 / width, 256.0 / height, 1.0)), 1) AS INT)
        |    AS resized_height
        |FROM feat ORDER BY doc_id""".stripMargin,

    // the real-decode round trip, predicted without a codec: pixel (x,y)
    // of doc_id's PNG is the affine-mod-256 triple the Spark side encoded,
    // PNG is lossless, and the decoder's luma is an exact integer sum —
    // so dims, header words, and mean luma are all plain arithmetic.
    "q106_image_features_imageio" ->
      """WITH ids AS (
        |  SELECT doc_id, 8 + doc_id % 5 AS w, 8 + doc_id % 3 AS h
        |  FROM documents WHERE doc_id % 4 = 0),
        |px AS (
        |  SELECT i.doc_id, i.w, i.h,
        |    299 * ((i.doc_id + 7 * gx.x + 13 * gy.y) % 256)
        |    + 587 * ((3 * i.doc_id + 5 * gx.x + 11 * gy.y) % 256)
        |    + 114 * ((7 * i.doc_id + 3 * gx.x + 17 * gy.y) % 256) AS luma_milli
        |  FROM ids i
        |  CROSS JOIN generate_series(0, 11) AS gx(x)
        |  CROSS JOIN generate_series(0, 9) AS gy(y)
        |  WHERE gx.x < i.w AND gy.y < i.h)
        |SELECT doc_id, w AS header_width, h AS header_height,
        |  CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  CAST(3 AS INT) AS channels,
        |  SUM(luma_milli)::DOUBLE / (w * h * 255000)::DOUBLE AS mean_luma
        |FROM px GROUP BY doc_id, w, h ORDER BY doc_id""".stripMargin,

    // the audio round trip, predicted without a codec: sample i of
    // doc_id's WAV is floorMod(doc_id + 7919·i, 65536) − 32768, PCM is
    // lossless, and the decoder's mean amplitude is an exact integer
    // sum over |sample| — plain arithmetic end to end.
    "q107_audio_features_wav" ->
      """WITH ids AS (
        |  SELECT doc_id, 400 + (doc_id % 3) * 200 AS n
        |  FROM documents WHERE doc_id % 4 = 1),
        |s AS (
        |  SELECT i.doc_id, i.n,
        |    abs((i.doc_id + 7919 * gx.x) % 65536 - 32768) AS a
        |  FROM ids i
        |  CROSS JOIN generate_series(0, 799) AS gx(x)
        |  WHERE gx.x < i.n)
        |SELECT doc_id,
        |  CAST(8000 AS BIGINT) AS header_sample_rate,
        |  CAST(8000 AS INT) AS sample_rate,
        |  CAST(1 AS INT) AS channels,
        |  n AS n_samples,
        |  (n * 1000) // 8000 AS duration_ms,
        |  SUM(a)::DOUBLE / (n * 32768)::DOUBLE AS mean_abs
        |FROM s GROUP BY doc_id, n ORDER BY doc_id""".stripMargin,

    // frame f, pixel (x,y) of doc_id's GIF holds gray level
    // (doc_id + 7x + 13y + 31f) mod 256; grayscale luma is 1000·level
    // milli-units, so each frame's mean is exact integer arithmetic.
    "q108_video_frames_gif" ->
      """WITH ids AS (
        |  SELECT doc_id, 8 + doc_id % 5 AS w, 8 + doc_id % 3 AS h,
        |    2 + doc_id % 3 AS nf
        |  FROM documents WHERE doc_id % 4 = 2),
        |px AS (
        |  SELECT i.doc_id, i.w, i.h, gf.f,
        |    (i.doc_id + 7 * gx.x + 13 * gy.y + 31 * gf.f) % 256 AS v
        |  FROM ids i
        |  CROSS JOIN generate_series(0, 3) AS gf(f)
        |  CROSS JOIN generate_series(0, 11) AS gx(x)
        |  CROSS JOIN generate_series(0, 9) AS gy(y)
        |  WHERE gf.f < i.nf AND gx.x < i.w AND gy.y < i.h)
        |SELECT doc_id, CAST(f AS INT) AS frame_idx,
        |  CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  (1000 * SUM(v))::DOUBLE / (w * h * 255000)::DOUBLE AS mean_luma
        |FROM px GROUP BY doc_id, f, w, h ORDER BY doc_id, frame_idx""".stripMargin,

    // per-frame grayscale samples predicted via md5 (identity palette →
    // lossless GIF round-trip); frame bits, candidates, per-frame-pair
    // hamming, and the clip roll-up all in plain SQL
    "q133_video_near_dup" ->
      """WITH ids AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 8 = 1 THEN doc_id - 1 ELSE doc_id END AS seed,
        |    CASE WHEN doc_id % 8 = 1 THEN 1 ELSE 0 END AS bump
        |  FROM documents),
        |par AS (SELECT doc_id, seed, bump, 2 + seed % 3 AS nf FROM ids),
        |px AS (
        |  SELECT p.doc_id, gf.f, gx.x, gy.y,
        |    ((('0x' || substring(md5(p.seed || ':' || gf.f || ':' || gy.y),
        |        2 * gx.x + 1, 2))::BIGINT
        |      + CASE WHEN gf.f = 0 AND gx.x = 0 AND gy.y = 0
        |             THEN p.bump ELSE 0 END) % 256) AS v
        |  FROM par p
        |    JOIN (SELECT unnest(range(0, 4)) AS f) gf ON gf.f < p.nf
        |    CROSS JOIN (SELECT unnest(range(0, 9)) AS x) gx
        |    CROSS JOIN (SELECT unnest(range(0, 8)) AS y) gy),
        |bits AS (
        |  SELECT a.doc_id, a.f, a.y // 2 AS band_idx,
        |    CAST(sum(CASE WHEN b.v > a.v
        |      THEN 1::BIGINT << ((a.y % 2) * 8 + a.x) ELSE 0 END)
        |      AS BIGINT) AS val
        |  FROM px a JOIN px b
        |    ON a.doc_id = b.doc_id AND a.f = b.f AND b.y = a.y
        |    AND b.x = a.x + 1
        |  WHERE a.x < 8
        |  GROUP BY a.doc_id, a.f, a.y // 2),
        |cand AS (
        |  SELECT DISTINCT x.doc_id AS id_a, x.f AS f_a,
        |    y.doc_id AS id_b, y.f AS f_b
        |  FROM bits x JOIN bits y
        |    ON x.band_idx = y.band_idx AND x.val = y.val
        |    AND x.doc_id < y.doc_id),
        |ham AS (
        |  SELECT c.id_a, c.id_b, c.f_a, c.f_b,
        |    CAST(sum(bit_count(xor(p.val, q.val))) AS BIGINT) AS hamming
        |  FROM cand c
        |    JOIN bits p ON p.doc_id = c.id_a AND p.f = c.f_a
        |    JOIN bits q ON q.doc_id = c.id_b AND q.f = c.f_b
        |      AND q.band_idx = p.band_idx
        |  GROUP BY c.id_a, c.id_b, c.f_a, c.f_b
        |  HAVING CAST(sum(bit_count(xor(p.val, q.val))) AS BIGINT) <= 10)
        |SELECT id_a, id_b, CAST(min(hamming) AS BIGINT) AS best_hamming,
        |  CAST(count(*) AS BIGINT) AS n_frame_matches
        |FROM ham GROUP BY id_a, id_b
        |ORDER BY id_a, id_b""".stripMargin,

    // PCM samples predicted from the generation rule (WAV is lossless);
    // block bounds, floor-division means, bits, bands, candidates, and
    // hamming all in plain SQL — `//` floors like Math.floorDiv
    "q132_audio_near_dup" ->
      """WITH ids AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 8 = 1 THEN doc_id - 1 ELSE doc_id END AS seed,
        |    CASE WHEN doc_id % 8 = 1 THEN 1 ELSE 0 END AS bump
        |  FROM documents),
        |par AS (SELECT doc_id, seed, bump, 400 + (seed % 3) * 200 AS n
        |        FROM ids),
        |samp AS (
        |  SELECT p.doc_id, r.i,
        |    ((('0x' || substring(md5(p.seed || ':' || (r.i // 8)),
        |        4 * (r.i % 8) + 1, 4))::BIGINT
        |      + CASE WHEN r.i = 0 THEN p.bump ELSE 0 END) % 65536)
        |      - 32768 AS s
        |  FROM par p JOIN (SELECT unnest(range(0, 800)) AS i) r
        |    ON r.i < p.n),
        |blocks AS (
        |  SELECT s.doc_id, b.b,
        |    CAST(sum(s.s) AS BIGINT) // CAST(count(*) AS BIGINT) AS mean_s
        |  FROM samp s
        |    JOIN par p ON p.doc_id = s.doc_id
        |    JOIN (SELECT unnest(range(0, 65)) AS b) b
        |      ON s.i >= (b.b * p.n) // 65 AND s.i < ((b.b + 1) * p.n) // 65
        |  GROUP BY s.doc_id, b.b),
        |bits AS (
        |  SELECT a.doc_id, a.b // 16 AS band_idx,
        |    CAST(sum(CASE WHEN c.mean_s > a.mean_s
        |      THEN 1::BIGINT << (a.b % 16) ELSE 0 END) AS BIGINT) AS val
        |  FROM blocks a JOIN blocks c
        |    ON a.doc_id = c.doc_id AND c.b = a.b + 1
        |  WHERE a.b < 64
        |  GROUP BY a.doc_id, a.b // 16),
        |cand AS (
        |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
        |  FROM bits x JOIN bits y
        |    ON x.band_idx = y.band_idx AND x.val = y.val
        |    AND x.doc_id < y.doc_id)
        |SELECT c.id_a, c.id_b,
        |  CAST(sum(bit_count(xor(p.val, q.val))) AS BIGINT) AS hamming
        |FROM cand c
        |  JOIN bits p ON p.doc_id = c.id_a
        |  JOIN bits q ON q.doc_id = c.id_b AND q.band_idx = p.band_idx
        |GROUP BY c.id_a, c.id_b
        |HAVING CAST(sum(bit_count(xor(p.val, q.val))) AS BIGINT) <= 10
        |ORDER BY id_a, id_b""".stripMargin,

    // the dHash predicted arithmetically from the pixel-generation rule
    // (PNG is lossless → decoded luma ≡ generated luma); bands, the
    // band-equality candidate join, and exact hamming all in plain SQL
    "q131_image_near_dup" ->
      """WITH ids AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 8 = 1 THEN doc_id - 1 ELSE doc_id END AS seed,
        |    CASE WHEN doc_id % 8 = 1 THEN 1 ELSE 0 END AS bump
        |  FROM documents),
        |px AS (
        |  SELECT i.doc_id, gx.x, gy.y,
        |    (('0x' || substring(md5(i.seed || ':' || gy.y),
        |        2 * gx.x + 1, 2))::BIGINT
        |     + CASE WHEN gx.x = 0 AND gy.y = 0 THEN i.bump ELSE 0 END)
        |    % 256 AS luma
        |  FROM ids i
        |    CROSS JOIN (SELECT unnest(range(0, 9)) AS x) gx
        |    CROSS JOIN (SELECT unnest(range(0, 8)) AS y) gy),
        |bits AS (
        |  SELECT a.doc_id, a.y // 2 AS band_idx,
        |    CAST(sum(CASE WHEN b.luma > a.luma
        |      THEN 1::BIGINT << ((a.y % 2) * 8 + a.x) ELSE 0 END)
        |      AS BIGINT) AS val
        |  FROM px a JOIN px b
        |    ON a.doc_id = b.doc_id AND b.y = a.y AND b.x = a.x + 1
        |  WHERE a.x < 8
        |  GROUP BY a.doc_id, a.y // 2),
        |cand AS (
        |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
        |  FROM bits x JOIN bits y
        |    ON x.band_idx = y.band_idx AND x.val = y.val
        |    AND x.doc_id < y.doc_id)
        |SELECT c.id_a, c.id_b,
        |  CAST(sum(bit_count(xor(p.val, q.val))) AS BIGINT) AS hamming
        |FROM cand c
        |  JOIN bits p ON p.doc_id = c.id_a
        |  JOIN bits q ON q.doc_id = c.id_b AND q.band_idx = p.band_idx
        |GROUP BY c.id_a, c.id_b
        |HAVING CAST(sum(bit_count(xor(p.val, q.val))) AS BIGINT) <= 10
        |ORDER BY id_a, id_b""".stripMargin,

    "q39_frame_sample" ->
      """SELECT doc_id, n_chars * 800 AS duration_ms, r.i AS frame_idx,
        |  (r.i * n_chars * 100)::BIGINT AS frame_time_ms
        |FROM documents, range(8) r(i)
        |WHERE doc_id % 50 = 0
        |ORDER BY doc_id, frame_idx""".stripMargin,
  )
}
