package graft

import graft.ext.{Dedup, IndexAudit, Ivf, Multimodal, Pq, Retrieval, TextOps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The repair half of the index lifecycle (round-10 directive): for
  * each recoverable corruption class the fsck reports, a `repairX`
  * rebuilds the damaged half from the authoritative one. Every test
  * runs the full contract: plant corruption → fsck trips → repair →
  * fsck clean → probe parity with the uncorrupted twin (the repaired
  * index must ANSWER identically, not merely audit green).
  */
class IndexRepairSpec extends SparkSpec {
  import spark.implicits._

  private def failures(df: DataFrame): Map[String, Long] =
    df.filter(!col("ok")).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap

  private def mkdb(name: String): Unit = {
    val loc = java.nio.file.Files.createTempDirectory(s"graft_$name").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $name LOCATION '$loc'")
  }

  test("BM25: stale meta trips the fsck; repairBm25Meta restores scalars " +
    "and probe parity") {
    mkdb("graft_repdb1")
    val docs = Seq((0L, "cat dog cat mouse"), (1L, "cat fish"),
      (2L, "dog dog dog"), (3L, "bird mouse cat")).toDF("doc_id", "text")
    Retrieval.writeBm25Index(docs, "doc_id", "text", "graft_repdb1.bm25",
      nBuckets = 2)
    val twin = Retrieval.bm25ProbeTopK(spark, "graft_repdb1.bm25",
      Seq("cat", "dog"), k = 10).collect().map(_.toSeq).toSeq
    // corruption: a meta refresh that never happened (wrong scalars)
    Seq((1L, 1L, "doc_id")).toDF("n", "t", "id_col")
      .write.format("parquet").mode("overwrite")
      .saveAsTable("graft_repdb1.bm25_meta")
    val bad = failures(IndexAudit.auditBm25(spark, "graft_repdb1.bm25"))
    assert(bad.contains("meta_n_docs") && bad.contains("meta_total_tokens"),
      bad)
    IndexAudit.repairBm25Meta(spark, "graft_repdb1.bm25")
    assert(failures(IndexAudit.auditBm25(spark, "graft_repdb1.bm25")).isEmpty)
    val after = Retrieval.bm25ProbeTopK(spark, "graft_repdb1.bm25",
      Seq("cat", "dog"), k = 10).collect().map(_.toSeq).toSeq
    assert(after == twin)
  }

  test("dHash: orphan + tampered postings trip the fsck; " +
    "repairDHashPostings rebuilds from the sidecar, probe parity holds") {
    mkdb("graft_repdb2")
    val media = Multimodal.syntheticRealPngNearDups(
      (0 until 16).map(_.toLong).toDF("doc_id"), "doc_id")
    val banded = Multimodal.withImageDHashBands(media, "payload")
    Multimodal.writeDHashIndex(banded, "doc_id", "graft_repdb2.dh",
      nBuckets = 2)
    val probe = banded.limit(4)
    val twin = Multimodal.dhashProbeIndexed(spark, "graft_repdb2.dh",
        probe, "doc_id", maxHamming = 1)
      .collect().map(_.toSeq).toSeq
    Seq((999L, 0, 12345L), (0L, 1, -1L)).toDF("doc_id", "band_idx", "val")
      .write.mode("append").insertInto("graft_repdb2.dh")
    val bad = failures(IndexAudit.auditDHash(spark, "graft_repdb2.dh",
      "doc_id"))
    assert(bad.contains("postings_without_bands") &&
      bad.contains("band_values_match"), bad)
    IndexAudit.repairDHashPostings(spark, "graft_repdb2.dh", "doc_id")
    assert(failures(IndexAudit.auditDHash(spark, "graft_repdb2.dh",
      "doc_id")).isEmpty)
    val after = Multimodal.dhashProbeIndexed(spark, "graft_repdb2.dh",
        probe, "doc_id", maxHamming = 1)
      .collect().map(_.toSeq).toSeq
    assert(after.sortBy(_.toString) == twin.sortBy(_.toString))
    assert(after.nonEmpty)
  }

  test("MinHash: a duplicated posting row trips the fsck; " +
    "repairMinhashPostings re-signatures the sidecar, probe parity holds") {
    mkdb("graft_repdb3")
    val docs = (0 until 20).map(i =>
        (i.toLong, s"alpha beta gamma delta epsilon token$i zeta eta"))
      .toDF("doc_id", "text")
    Dedup.writeMinhashIndex(docs, "doc_id", "text", "graft_repdb3.mh",
      shingleN = 3, k = 16, bands = 4, nBuckets = 2)
    val probe = docs.limit(5)
    def probeNow() = Dedup.minhashProbeIndexed(spark, "graft_repdb3.mh",
        probe, "doc_id", "text", shingleN = 3, k = 16, bands = 4,
        minJaccard = 0.3)
      .collect().map(_.toSeq).toSeq
    val twin = probeNow()
    // corruption: a replayed append duplicates one id's band row — the
    // non-modal band count a truncated/replayed write leaves behind
    val dup = spark.table("graft_repdb3.mh").limit(1)
    dup.write.mode("append").insertInto("graft_repdb3.mh")
    val bad = failures(IndexAudit.auditMinhash(spark, "graft_repdb3.mh",
      "doc_id"))
    assert(bad.contains("uniform_band_count"), bad)
    IndexAudit.repairMinhashPostings(spark, "graft_repdb3.mh", "doc_id",
      k = 16, bands = 4)
    assert(failures(IndexAudit.auditMinhash(spark, "graft_repdb3.mh",
      "doc_id")).isEmpty)
    assert(probeNow().sortBy(_.toString) == twin.sortBy(_.toString))
  }

  test("IVF: scrambled assignments trip the fsck; repairIvfAssignments " +
    "re-assigns under the stored model, probe parity holds") {
    graft.plans.GraftFunctions.register(spark)
    mkdb("graft_repdb4")
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val cents = Ivf.trainCentroids(emb, "embedding", nList = 4, dim = 64,
      sampleSize = 500, iters = 2)
    Ivf.writeIndex(emb, "vec_id", "embedding", cents, dim = 64,
      table = "graft_repdb4.ivf", nBuckets = 2)
    val queries = emb.filter(col("vec_id") % 100 === 0)
    def probeNow() = Ivf.ivfTopKIndexed(spark, "graft_repdb4.ivf", queries,
        "vec_id", "embedding", k = 5, nProbe = 4)
      .collect().map(_.toSeq).toSeq
    val twin = probeNow()
    // corruption: a stale-layout rewrite rotated every list id (the
    // stored model no longer explains the assignments)
    val scrambled = spark.table("graft_repdb4.ivf").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toSeq,
        (r.getInt(2) + 1) % 4)).toSeq
      .toDF("vec_id", "embedding", "list")
    scrambled.write.format("parquet").bucketBy(2, "list").sortBy("list")
      .mode("overwrite").saveAsTable("graft_repdb4.ivf")
    val bad = failures(IndexAudit.auditIvf(spark, "graft_repdb4.ivf",
      "vec_id", "embedding"))
    assert(bad.contains("assignments_match_model"), bad)
    IndexAudit.repairIvfAssignments(spark, "graft_repdb4.ivf", "vec_id",
      "embedding")
    assert(failures(IndexAudit.auditIvf(spark, "graft_repdb4.ivf",
      "vec_id", "embedding")).isEmpty)
    assert(probeNow() == twin)
    assert(twin.nonEmpty)
  }

  test("IVF-PQ: scrambled lists + malformed codes trip the fsck; " +
    "repairPqCodes re-encodes under the stored model, probe parity holds") {
    graft.plans.GraftFunctions.register(spark)
    mkdb("graft_repdb5")
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val coarse = Ivf.trainCentroids(emb, "embedding", nList = 4, dim = 64,
      sampleSize = 500, iters = 2)
    val cb = Pq.trainCodebooks(emb, "embedding", coarse, m = 8, ksub = 16,
      dim = 64, sampleSize = 300, iters = 2)
    Pq.writeIndex(emb, "vec_id", "embedding", coarse, cb, m = 8, dsub = 8,
      ksub = 16, table = "graft_repdb5.pq", nBuckets = 2)
    val queries = emb.filter(col("vec_id") % 100 === 0)
    def probeNow() = Pq.pqTopKIndexed(spark, "graft_repdb5.pq", queries,
        "vec_id", "embedding", k = 5, nProbe = 4)
      .collect().map(_.toSeq).toSeq
    val twin = probeNow()
    // corruption: a stale-model rewrite — every list rotated, every code
    // column replaced by an out-of-geometry stub (the shape an encode
    // against the WRONG codebook leaves; vectors themselves intact)
    val scrambled = spark.table("graft_repdb5.pq").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toSeq,
        (r.getInt(2) + 1) % 4, Seq(99, 99))).toSeq
      .toDF("vec_id", "embedding", "list", "codes")
    scrambled.write.format("parquet").bucketBy(2, "list").sortBy("list")
      .mode("overwrite").saveAsTable("graft_repdb5.pq")
    val bad = failures(IndexAudit.auditPq(spark, "graft_repdb5.pq",
      "vec_id", "embedding"))
    assert(bad.contains("codes_shape_and_range") &&
      bad.contains("assignments_match_model"), bad)
    IndexAudit.repairPqCodes(spark, "graft_repdb5.pq", "vec_id", "embedding")
    assert(failures(IndexAudit.auditPq(spark, "graft_repdb5.pq",
      "vec_id", "embedding")).isEmpty)
    assert(probeNow() == twin)
    assert(twin.nonEmpty)
  }

  test("unigram model: a stale meta window trips the fsck and silently " +
    "mis-tokenizes; repairUnigramMeta recomputes it, tokenize parity holds") {
    mkdb("graft_repdb6")
    val vocab = Seq(
      ("a", 9L, 100L), ("b", 8L, 110L), ("c", 7L, 120L), ("d", 6L, 130L),
      ("ab", 5L, 150L), ("abcd", 4L, 160L))
      .toDF("piece", "cnt", "cost_micro")
    TextOps.writeUnigramModel(spark, "graft_repdb6.um", vocab,
      maxPieceLen = 4)
    val docs = Seq((0L, "abcd ab"), (1L, "dcba")).toDF("doc_id", "text")
    def tokensNow() = TextOps.withUnigramTokensIndexed(spark,
        "graft_repdb6.um", docs, "text")
      .select("doc_id", "unigram_tokens").collect().map(_.toSeq).toSeq
    val twin = tokensNow()
    // corruption: a meta refresh that never followed the vocab write —
    // the recorded window is smaller than the longest piece, so the
    // Viterbi can never CHOOSE "abcd": wrong answers, no error
    Seq(2).toDF("max_piece_len")
      .write.format("parquet").mode("overwrite")
      .saveAsTable("graft_repdb6.um_meta")
    val bad = failures(IndexAudit.auditUnigramModel(spark,
      "graft_repdb6.um"))
    assert(bad.contains("pieces_within_window"), bad)
    assert(tokensNow() != twin) // the silent mis-tokenization, observed
    IndexAudit.repairUnigramMeta(spark, "graft_repdb6.um")
    assert(failures(IndexAudit.auditUnigramModel(spark,
      "graft_repdb6.um")).isEmpty)
    assert(tokensNow() == twin)
    assert(twin.nonEmpty)
  }
}
