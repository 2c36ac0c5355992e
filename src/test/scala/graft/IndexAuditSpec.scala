package graft

import graft.ext.{IndexAudit, Ivf, Multimodal, Retrieval}
import graft.plans.GraftFunctions
import org.apache.spark.sql.functions._

/** Index fsck: every audit passes on a freshly built healthy index,
  * and each planted corruption (the realistic partial-write / lost-
  * append / stale-model failures) trips exactly its check.
  */
class IndexAuditSpec extends SparkSpec {
  import spark.implicits._

  private def failures(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
    df.filter(!col("ok")).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap

  test("BM25 audit: healthy index clean; a lost-append posting trips " +
    "df/dl consistency and the meta scalars") {
    val docs = Seq((0L, "cat dog cat"), (1L, "cat fish"), (2L, "dog dog"))
      .toDF("doc_id", "text")
    val loc = java.nio.file.Files.createTempDirectory("graft_audit1").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_auditdb LOCATION '$loc'")
    Retrieval.writeBm25Index(docs, "doc_id", "text", "graft_auditdb.bm25",
      nBuckets = 2)
    assert(failures(IndexAudit.auditBm25(spark, "graft_auditdb.bm25"))
      .isEmpty)
    // corruption: a posting for a NEW doc with a df that disagrees with
    // reality and a dl unseen by the meta build — the shape a partial
    // append (postings written, meta not refreshed) leaves behind
    Seq(("cat", 9L, 1L, 4L, 99L))
      .toDF("term", "doc_id", "tf", "dl", "df")
      .write.mode("append").insertInto("graft_auditdb.bm25")
    val bad = failures(IndexAudit.auditBm25(spark, "graft_auditdb.bm25"))
    assert(bad.contains("meta_n_docs"), bad)
    assert(bad.contains("meta_total_tokens"), bad)
    assert(bad.contains("df_consistent"), bad)
  }

  test("dHash audit: healthy index clean; orphan postings and tampered " +
    "band values trip their checks") {
    val media = Multimodal.syntheticRealPngNearDups(
      (0 until 16).map(_.toLong).toDF("doc_id"), "doc_id")
    val loc = java.nio.file.Files.createTempDirectory("graft_audit2").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_auditdb2 LOCATION '$loc'")
    Multimodal.writeDHashIndex(
      Multimodal.withImageDHashBands(media, "payload"), "doc_id",
      "graft_auditdb2.dh", nBuckets = 2)
    assert(failures(IndexAudit.auditDHash(spark, "graft_auditdb2.dh",
      "doc_id")).isEmpty)
    // corruption 1: a posting whose id has no bands row (half an append)
    Seq((999L, 0, 12345L)).toDF("doc_id", "band_idx", "val")
      .write.mode("append").insertInto("graft_auditdb2.dh")
    // corruption 2: a posting whose value disagrees with the stored bands
    Seq((0L, 1, -1L)).toDF("doc_id", "band_idx", "val")
      .write.mode("append").insertInto("graft_auditdb2.dh")
    val bad = failures(IndexAudit.auditDHash(spark, "graft_auditdb2.dh",
      "doc_id"))
    assert(bad.get("postings_without_bands").contains(1L), bad)
    assert(bad.get("band_values_match").contains(1L), bad)
  }

  test("IVF audit: healthy index clean; rows assigned under a stale " +
    "model trip assignments_match_model") {
    GraftFunctions.register(spark)
    val emb = CrossoverBench.syntheticEmbeddings(spark, 400, 64, seed = 7L)
    val loc = java.nio.file.Files.createTempDirectory("graft_audit3").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_auditdb3 LOCATION '$loc'")
    val c = Ivf.trainCentroids(emb, "embedding", nList = 8, dim = 64,
      sampleSize = 400, iters = 3)
    Ivf.writeIndex(emb, "vec_id", "embedding", c, dim = 64,
      "graft_auditdb3.ivf", nBuckets = 2)
    assert(failures(IndexAudit.auditIvf(spark, "graft_auditdb3.ivf",
      "vec_id", "embedding")).isEmpty)
    // corruption: rows landed with a DIFFERENT model's assignments (the
    // stale-quantizer overwrite appendToIndex exists to prevent) — force
    // it by appending with every list shifted
    val stale = spark.table("graft_auditdb3.ivf")
      .filter(col("vec_id") < 5)
      .select((col("vec_id") + 5000L).as("vec_id"), col("embedding"),
        ((col("list") + 1) % 8).as("list"))
    stale.write.mode("append").insertInto("graft_auditdb3.ivf")
    val bad = failures(IndexAudit.auditIvf(spark, "graft_auditdb3.ivf",
      "vec_id", "embedding"))
    assert(bad.get("assignments_match_model").exists(_ >= 4L), bad)
  }
}
