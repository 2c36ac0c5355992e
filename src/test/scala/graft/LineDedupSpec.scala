package graft

import graft.ext.Dedup

class LineDedupSpec extends SparkSpec {
  import spark.implicits._

  // lines: "a" appears in docs 1,2,3; "b" in 1,3; "c" only in 2;
  // doc 3 is ENTIRELY previously-seen lines
  private val docs = Seq(
    (1L, "a\nb"),
    (2L, "a\nc"),
    (3L, "b\na")
  ).toDF("doc_id", "text")

  test("keeps the globally first occurrence of each line, by (id, idx)") {
    val out = Dedup.dedupLines(docs, "doc_id", "text")
      .select("doc_id", "n_lines", "n_kept", "text_kept")
      .as[(Long, Long, Long, String)].collect().toMap2
    assert(out(1L) == ((2L, 2L, "a\nb")))
    assert(out(2L) == ((2L, 1L, "c")))
    assert(out(3L) == ((2L, 0L, "")))
  }

  test("within one document, a repeated line keeps its first index") {
    val d = Seq((7L, "x\ny\nx")).toDF("doc_id", "text")
    val r = Dedup.dedupLines(d, "doc_id", "text")
      .select("n_lines", "n_kept", "text_kept")
      .as[(Long, Long, String)].head()
    assert(r == ((3L, 2L, "x\ny")))
  }

  test("reassembly preserves original line order, not dedup order") {
    val d = Seq((1L, "z|m|a"), (2L, "m|q")).toDF("doc_id", "text")
    val out = Dedup.dedupLines(d, "doc_id", "text", sep = "|")
      .select("doc_id", "text_kept").as[(Long, String)].collect().toMap
    assert(out(1L) == "z|m|a") // 'z' stays first even though 'a' < 'z'
    assert(out(2L) == "q")
  }

  test("custom separator is treated literally, not as regex") {
    val d = Seq((1L, "a.b.a")).toDF("doc_id", "text")
    val r = Dedup.dedupLines(d, "doc_id", "text", sep = ".")
      .select("n_lines", "n_kept").as[(Long, Long)].head()
    assert(r == ((3L, 2L)))
  }

  test("a NULL-text document keeps its output row instead of vanishing") {
    val d = Seq((1L, Some("a\nb")), (2L, None))
      .toDF("doc_id", "text")
    val out = Dedup.dedupLines(d, "doc_id", "text")
      .select("doc_id", "n_lines", "n_kept", "text_kept")
      .as[(Long, Long, Long, String)].collect().toMap2
    assert(out(1L) == ((2L, 2L, "a\nb")))
    assert(out(2L) == ((0L, 0L, "")))
  }

  test("total kept lines across the corpus equals distinct line count") {
    val kept = Dedup.dedupLines(docs, "doc_id", "text")
      .agg(org.apache.spark.sql.functions.sum("n_kept")).as[Long].head()
    assert(kept == 3L) // distinct lines: a, b, c
  }

  private implicit class Map2[K, A, B, C](rows: Array[(K, A, B, C)]) {
    def toMap2: Map[K, (A, B, C)] =
      rows.map(r => r._1 -> ((r._2, r._3, r._4))).toMap
  }
}
