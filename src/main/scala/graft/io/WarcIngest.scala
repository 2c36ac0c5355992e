package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WARC (ISO 28500 / Common Crawl) record parsing over text-mode
  * archive bodies — the ingestion format a crawl corpus actually
  * arrives in. The reference pipeline ingests directory-scanned CSV
  * (reference `project/etl2.py:32`-style directory scans); a
  * crawl-scale corpus's raw tier is
  * WARC, and everything downstream of q145 (extract → repair →
  * quality → dedup) assumes the per-record payloads this operator
  * produces.
  *
  * Parse contract (each piece pinned by `WarcIngestSpec`):
  *   - records split on the literal `WARC/1.0\r\n` version line; the
  *     preamble before the first version line is dropped;
  *   - a record's WARC headers run to the FIRST blank CRLF line
  *     (the WARC header block itself never contains one);
  *   - the payload is sliced by `Content-Length` from just past the
  *     blank line — NOT by searching for a terminator, because
  *     response payloads embed their own `\r\n\r\n` (HTTP headers +
  *     body) and only the declared length is authoritative;
  *   - `length_matches` flags records whose remaining bytes fall
  *     short of the declared length (truncated captures — the fsck
  *     signal); records without a Content-Length get a null payload.
  *
  * KNOWN HAZARD (version-line false split): because records split on
  * the literal version line, a response PAYLOAD that itself contains
  * the byte sequence `WARC/1.0\r\n` (a crawled page about WARC, a
  * nested archive) falsely truncates its record and emits spurious
  * fragment records after it. The damage is FLAGGED, not silent —
  * the truncated record's remaining bytes fall short of its declared
  * Content-Length, so `length_matches=false` marks it for the fsck
  * tier exactly like a short capture — but the fragments are noise.
  * This is the same class of caveat as the embedded `\r\n\r\n`
  * (which is why Content-Length, not terminator search, slices
  * payloads); a split on full record boundaries would need
  * stateful byte scanning that doesn't fit the one-projection shape.
  * Spec-pinned (`WarcIngestSpec` embeds the version line in a
  * payload and asserts the flag trips).
  *
  * 100 TB shape: one projection + one generator per archive —
  * archives die in the split, payload slicing is per-row substring
  * arithmetic, and the catalog query carries payload DIGESTS so no
  * exchange moves record bodies. Text-mode contract here;
  * [[parseWarcRecordsGz]] is the BINARY reader tier feeding the same
  * relational parse from gzip-membered archives (the format Common
  * Crawl actually ships).
  */
object WarcIngest {

  /** One row per WARC record in `txtCol`: `rec_no` (1-based),
    * `warc_type`, `target_uri` (empty when absent), `content_length`
    * (null when absent), `payload` and `payload_len`, and
    * `length_matches`. */
  def parseWarcRecords(df: DataFrame, fileIdCol: String, txtCol: String)
      : DataFrame =
    df.select(col(fileIdCol),
        posexplode(split(col(txtCol), "WARC/1\\.0\r\n"))
          .as(Seq("__pos", "__rec")))
      .filter(col("__pos") > 0) // element 0 = pre-version preamble
      .withColumn("rec_no", col("__pos").cast("long"))
      .withColumn("__hdr", element_at(split(col("__rec"), "\r\n\r\n"), 1))
      .withColumn("warc_type",
        regexp_extract(col("__hdr"), "(?m)^WARC-Type: ([^\r]*)", 1))
      .withColumn("target_uri",
        regexp_extract(col("__hdr"), "(?m)^WARC-Target-URI: ([^\r]*)", 1))
      .withColumn("content_length",
        nullif(regexp_extract(col("__hdr"),
          "(?m)^Content-Length: ([0-9]+)", 1), lit("")).cast("long"))
      .withColumn("payload",
        when(col("content_length").isNotNull,
          col("__rec").substr(length(col("__hdr")) + 5,
            col("content_length").cast("int"))))
      .withColumn("payload_len", length(col("payload")))
      .withColumn("length_matches",
        coalesce(col("payload_len") === col("content_length"), lit(false)))
      .drop("__pos", "__rec", "__hdr")

  /** Decompress one gzip archive (possibly MULTI-MEMBER — Common
    * Crawl writes one gzip member per record, concatenated; the JDK's
    * `GZIPInputStream` reads concatenated members natively) and
    * decode as UTF-8, the crawl web's dominant transport encoding.
    * The relational parser is CHARACTER-oriented — its Content-Length
    * arithmetic counts chars, exactly like the text tier it must be
    * row-for-row equal to and like the DuckDB oracle's `length()` —
    * so UTF-8 decode makes gz-tier output identical to text-tier
    * output for any content both can carry. The delta to ISO 28500
    * (whose Content-Length counts BYTES, diverging from chars on
    * multibyte content) is shared by BOTH tiers and surfaces as
    * `length_matches=false` rather than silent mis-slicing. */
  private def gunzipToString(bytes: Array[Byte],
      charset: java.nio.charset.Charset =
        java.nio.charset.StandardCharsets.UTF_8): String = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      // initial-size hint only: clamped to 64 MiB so the Int arithmetic
      // cannot overflow negative on a >512 MB compressed archive (the
      // stream still grows past the hint as needed). A single archive
      // decompressing past 2 GiB cannot fit one JVM String — that is
      // the seam's HARD bound, so callers must shard bigger archives
      // (Common Crawl's ~1 GB-compressed/~4 GB-raw files ship as
      // per-record gzip members and re-chunk losslessly on member
      // boundaries); past it, ByteArrayOutputStream throws rather than
      // silently truncating.
      val hint = Math.toIntExact(Math.min(
        Math.max(bytes.length.toLong * 4L, 64L), 1L << 26))
      val out = new java.io.ByteArrayOutputStream(hint)
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      new String(out.toByteArray, charset)
    } finally in.close()
  }

  /** HTTP response-message parsing over WARC response PAYLOADS — the
    * gate the crawl funnel otherwise assumes away (q159 splits the
    * body off blindly; a real crawl's responses are not all
    * `200 text/html`). Appends to `df`:
    *
    *   - `http_status`: the status-line code (`HTTP/x.y SSS ...`,
    *     RFC 9112 §4) as a long, null when the payload is not an
    *     HTTP response message;
    *   - `http_media_type`: the `Content-Type` header's media type,
    *     lowercased with parameters (`; charset=...`) stripped and
    *     RFC whitespace trimmed — empty when the header is absent
    *     (media types are case-insensitive, RFC 9110 §8.3.1);
    *   - `http_charset`: the `charset=` parameter the media type
    *     strips, lowercased, optional quote skipped — empty when
    *     undeclared (the decode tier's signal: real crawls declare
    *     ISO-8859-1/windows-1252, and honoring the declaration is the
    *     first-line fix `TextOps.repairMojibake` otherwise backstops
    *     heuristically — see [[decodeBodyCharset]]);
    *   - `http_location`: the `Location` header verbatim (the
    *     redirect-following signal, empty when absent);
    *   - `http_etag` / `http_last_modified`: the conditional
    *     re-fetch validators (RFC 9110 §8.8) verbatim, empty when
    *     absent — `ETag` rides the re-fetch schedule as the
    *     `If-None-Match` token, `Last-Modified` feeds the
    *     header-attested recency ranking
    *     ([[graft.ext.UrlOps.httpDateToIso]] → `recencyBucket`);
    *   - `http_retry_after`: the `Retry-After` header verbatim
    *     (RFC 9110 §10.2.3 — the 429/503 throttle signal a polite
    *     crawler MUST fold into its per-host schedule;
    *     [[graft.ext.UrlOps.retryAfterMicros]] parses both the
    *     delta-seconds and HTTP-date forms), empty when absent;
    *   - `http_content_language`: the `Content-Language` header
    *     verbatim (RFC 9110 §8.5 — the transport-level language
    *     declaration; q182 reconciles it with the in-document
    *     `<html lang>` and the detected language), empty when absent;
    *   - `http_body`: everything past the first blank CRLF line
    *     (null for non-HTTP payloads);
    *   - `is_fetch_content`: status 200 AND media type `text/html` —
    *     the funnel's admission predicate.
    *
    * One zero-shuffle projection over the payload column; headers are
    * bounded (the first blank line), the body is never re-copied
    * except into `http_body` (which downstream projections prune when
    * unused). Case-insensitive header names, first occurrence wins
    * (`(?mi)` anchored extraction — RE2-safe, shared with the q163
    * oracle). */
  def withHttpResponse(df: DataFrame, payloadCol: String): DataFrame = {
    val p = col(payloadCol)
    val isHttp = p.rlike("^HTTP/[0-9.]+ [0-9]{3}")
    val hdr = element_at(split(p, "\r\n\r\n"), 1)
    val ct = lower(trim(regexp_extract(hdr,
      "(?mi)^Content-Type:([^\r;]*)", 1), " \t"))
    df.withColumn("http_status",
        when(isHttp, regexp_extract(p, "^HTTP/[0-9.]+ ([0-9]{3})", 1)
          .cast("long")))
      .withColumn("http_media_type", when(isHttp, ct).otherwise(lit("")))
      .withColumn("http_charset",
        when(isHttp, lower(trim(regexp_extract(hdr,
          "(?mi)^Content-Type:[^\r]*?charset=\"?([A-Za-z0-9_.:-]*)", 1),
          " \t")))
          .otherwise(lit("")))
      .withColumn("http_location",
        when(isHttp, trim(regexp_extract(hdr,
          "(?mi)^Location:([^\r]*)", 1), " \t")).otherwise(lit("")))
      .withColumn("http_etag",
        when(isHttp, trim(regexp_extract(hdr,
          "(?mi)^ETag:([^\r]*)", 1), " \t")).otherwise(lit("")))
      .withColumn("http_last_modified",
        when(isHttp, trim(regexp_extract(hdr,
          "(?mi)^Last-Modified:([^\r]*)", 1), " \t")).otherwise(lit("")))
      .withColumn("http_retry_after",
        when(isHttp, trim(regexp_extract(hdr,
          "(?mi)^Retry-After:([^\r]*)", 1), " \t")).otherwise(lit("")))
      .withColumn("http_content_language",
        when(isHttp, trim(regexp_extract(hdr,
          "(?mi)^Content-Language:([^\r]*)", 1), " \t")).otherwise(lit("")))
      .withColumn("http_body",
        when(isHttp, p.substr(length(hdr) + 5, length(p))))
      .withColumn("is_fetch_content",
        coalesce(col("http_status") === 200 &&
          col("http_media_type") === "text/html", lit(false)))
  }

  /** [[parseWarcRecords]] fed from BINARY gzip-membered archives —
    * the wire format a crawl corpus actually arrives in (Common
    * Crawl's `.warc.gz`: one gzip member per record, members
    * concatenated; single-member whole-archive gzip reads
    * identically). `binCol` is a `binary` column of whole-archive
    * bytes; `fileIdCol` must be numeric (cast to long).
    *
    * The decompress runs in a `mapPartitions` seam (the
    * [[graft.ext.Multimodal]] decode-seam pattern): archive BYTES are
    * born and die inside the partition — only the decoded text enters
    * the plan, and it immediately dies in [[parseWarcRecords]]'s
    * harvest projection, so neither bytes nor record bodies ever
    * cross an exchange. Row-for-row parity with the text tier over
    * the same archives is spec-pinned (`WarcIngestSpec`), and the
    * q159 archive→funnel round trip holds through this tier
    * (`CrawlFunnelSpec`). */
  def parseWarcRecordsGz(df: DataFrame, fileIdCol: String,
      binCol: String): DataFrame =
    parseWarcRecordsGz(df, fileIdCol, binCol, byteView = false)

  /** [[parseWarcRecordsGz]] with a BYTE-VIEW tier (`byteView = true`):
    * the archive decodes as ISO-8859-1 — a 1:1 byte→char map — so the
    * relational parser's Content-Length arithmetic counts BYTES,
    * exactly ISO 28500's contract (the UTF-8 tier counts CHARS and
    * flags multibyte content `length_matches=false`), and response
    * payloads come out as byte-view strings ready for the
    * DECLARED-charset decode: `withHttpResponse` extracts
    * `http_charset` (HTTP headers are ASCII, identical in both
    * views), then [[decodeBodyCharset]] decodes each body per its
    * declaration (UTF-8 / ISO-8859-1 / windows-1252 — real crawls
    * declare all three; the old UTF-8-only whole-archive decode
    * mangles the latter two, which `TextOps.repairMojibake` then has
    * to backstop heuristically). Spec-pinned round trips in
    * `WarcIngestSpec`. */
  def parseWarcRecordsGz(df: DataFrame, fileIdCol: String,
      binCol: String, byteView: Boolean): DataFrame = {
    val spark = df.sparkSession
    // Charset objects are not serializable — ship the NAME, resolve
    // once per partition inside the seam
    val csName = if (byteView) "ISO-8859-1" else "UTF-8"
    implicit val enc: org.apache.spark.sql.Encoder[(Long, String)] =
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.STRING)
    val txt = df.select(col(fileIdCol).cast("long"), col(binCol))
      .mapPartitions { rows =>
        val cs = java.nio.charset.Charset.forName(csName)
        rows.map(r =>
          (r.getLong(0), gunzipToString(r.getAs[Array[Byte]](1), cs)))
      }
      .toDF(fileIdCol, "__gz_txt")
    parseWarcRecords(txt, fileIdCol, "__gz_txt")
  }

  /** The declared-charset decode of a BYTE-VIEW HTTP body
    * (`graft.plans.CharsetDecodeExpr`): UTF-8 for `utf-8`/undeclared/
    * unknown (malformed bytes become U+FFFD, never an exception),
    * identity for `iso-8859-1`, the cp1252 table for `windows-1252`.
    * Compose after [[parseWarcRecordsGz]]`(byteView = true)` +
    * [[withHttpResponse]]: `decodeBodyCharset(col("http_body"),
    * col("http_charset"))`. Zero-shuffle codegen'd projection;
    * callers register `graft.plans.GraftFunctions` first (every
    * catalog entry already does). */
  def decodeBodyCharset(body: org.apache.spark.sql.Column,
      charset: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    call_function("graft_charset_decode", body, charset)
}
