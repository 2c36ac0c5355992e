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
  * 100 TB shape: one projection + one generator per archive —
  * archives die in the split, payload slicing is per-row substring
  * arithmetic, and the catalog query carries payload DIGESTS so no
  * exchange moves record bodies. Text-mode contract: byte-exact
  * binary WARC (gzip members, non-UTF-8 payloads) is the reader
  * tier's job; this operator owns the relational record structure.
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
}
