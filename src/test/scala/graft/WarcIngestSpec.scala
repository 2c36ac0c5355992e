package graft

import org.apache.spark.sql.functions._

class WarcIngestSpec extends SparkSpec {
  import spark.implicits._
  import graft.io.WarcIngest

  private def rec(hdrs: Seq[(String, String)], payload: String,
      declaredLen: Option[Long] = None): String =
    "WARC/1.0\r\n" +
      (hdrs :+ ("Content-Length" ->
        declaredLen.getOrElse(payload.length.toLong).toString))
        .map { case (k, v) => s"$k: $v" }.mkString("\r\n") +
      "\r\n\r\n" + payload + "\r\n\r\n"

  private def parse(txt: String) =
    WarcIngest.parseWarcRecords(Seq((1L, txt)).toDF("id", "txt"), "id", "txt")
      .orderBy("rec_no")
      .select("rec_no", "warc_type", "target_uri", "content_length",
        "payload", "length_matches")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.getString(4)), r.getBoolean(5))).toSeq

  test("records split, headers bind, payloads slice by declared length") {
    val httpBody = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
      "<html>x</html>" // payload with an EMBEDDED blank CRLF line
    val txt = rec(Seq("WARC-Type" -> "warcinfo"), "software: graft") +
      rec(Seq("WARC-Type" -> "response",
        "WARC-Target-URI" -> "https://a.com/p"), httpBody)
    assert(parse(txt) === Seq(
      (1L, "warcinfo", "", Some(15L), Some("software: graft"), true),
      (2L, "response", "https://a.com/p", Some(httpBody.length.toLong),
        Some(httpBody), true)))
  }

  test("a short capture flags length_matches=false; missing " +
    "Content-Length gives a null payload") {
    val txt = rec(Seq("WARC-Type" -> "metadata"), "abc",
        declaredLen = Some(10L)) + // declares 10, only 3+terminator remain
      "WARC/1.0\r\nWARC-Type: resource\r\n\r\nnolen\r\n\r\n"
    val out = parse(txt)
    assert(out(0)._4 === Some(10L) && !out(0)._6)
    assert(out(1)._2 == "resource" && out(1)._4.isEmpty &&
      out(1)._5.isEmpty && !out(1)._6)
  }

  test("preamble before the first version line is dropped") {
    val txt = "junk preamble\n" + rec(Seq("WARC-Type" -> "warcinfo"), "p")
    val out = parse(txt)
    assert(out.size == 1 && out.head._2 == "warcinfo")
  }
}
