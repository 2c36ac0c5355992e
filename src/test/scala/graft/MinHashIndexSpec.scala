package graft

import graft.ext.Dedup
import org.apache.spark.sql.functions._

/** Persisted MinHash-LSH band index: probe parity with the in-place
  * pipeline, cross-batch semantics, and the Exchange-free corpus side
  * the bucketed layout exists for.
  */
class MinHashIndexSpec extends SparkSpec {
  import spark.implicits._

  graft.plans.GraftFunctions.register(spark)

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog tonight"),
    (2L, "the quick brown fox jumps over the lazy dog tonight"), // dup of 1
    (3L, "completely unrelated corpus content with no shared trigrams at all"),
    (4L, "another distinct corpus document about something else entirely now")
  ).toDF("doc_id", "text")

  private val batch = Seq(
    (10L, "the quick brown fox jumps over the lazy dog today"), // near-dup 1,2
    (11L, "fresh novel batch content sharing nothing with the corpus here")
  ).toDF("doc_id", "text")

  private lazy val table: String = {
    val loc = java.nio.file.Files.createTempDirectory("graft_mhidx").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_mhdb LOCATION '$loc'")
    Dedup.writeMinhashIndex(corpus, "doc_id", "text", "graft_mhdb.mh_idx",
      nBuckets = 4, useNative = true)
    "graft_mhdb.mh_idx"
  }

  test("probe finds cross near-dups, skips novel docs, jaccard verified") {
    val got = Dedup.minhashProbeIndexed(spark, table, batch, "doc_id",
        "text", minJaccard = 0.5, useNative = true)
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got.keySet == Set((10L, 1L), (10L, 2L)))
    got.values.foreach(j => assert(j >= 0.5 && j < 1.0))
  }

  test("probe parity: indexed pairs equal the in-place pipeline's cross pairs") {
    val everything = corpus.unionByName(batch)
    val all = Dedup.minhashNearDupPairs(everything, "doc_id", "text",
        minJaccard = 0.5, useNative = true)
      .as[(Long, Long, Double)].collect().toSet
    // restrict to (corpus, batch) cross pairs; the index probe reports
    // them as (id_new, id_corpus)
    val crossFromAll = all.collect {
      case (a, b, j) if a < 10L && b >= 10L => (b, a, j)
      case (a, b, j) if b < 10L && a >= 10L => (a, b, j)
    }
    val indexed = Dedup.minhashProbeIndexed(spark, table, batch, "doc_id",
        "text", minJaccard = 0.5, useNative = true)
      .as[(Long, Long, Double)].collect().toSet
    assert(indexed == crossFromAll,
      s"index probe diverged:\n$crossFromAll\nvs\n$indexed")
  }

  test("candidate bucket join shuffles ONLY the batch side (index is bucketed)") {
    table // force write
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val batchBands = batch.select(col("doc_id").as("id_new"),
          Dedup.wordShingles(col("text"), 3, useNative = true).as("sh"))
        .select(col("id_new"),
          Dedup.minhashSignatureNative(col("sh"), 64).as("sig"))
        .select(col("id_new"),
          posexplode(Dedup.lshBandKeys(col("sig"), 64, 16))
            .as(Seq("band", "bucket")))
        .select(col("id_new"),
          concat_ws(":", col("band"), col("bucket")).as("bucket_key"))
      val idx = spark.table(table)
        .select(col("doc_id").as("id_corpus"), col("bucket_key"))
      val cands = idx.join(batchBands, Seq("bucket_key"))
      val plan = cands.queryExecution.executedPlan.toString
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(exchanges == 1,
        s"expected exactly the batch-side shuffle, got $exchanges:\n$plan")
      assert(plan.contains("Bucketed: true"),
        s"index scan not using buckets:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("portable index round-trips with the portable signature variant") {
    val loc = java.nio.file.Files.createTempDirectory("graft_mhidx_p").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_mhdb_p LOCATION '$loc'")
    Dedup.writeMinhashIndex(corpus, "doc_id", "text", "graft_mhdb_p.mh_idx",
      nBuckets = 4, useNative = true, portable = true)
    val got = Dedup.minhashProbeIndexed(spark, "graft_mhdb_p.mh_idx", batch,
        "doc_id", "text", minJaccard = 0.5, useNative = true,
        portable = true)
      .select("id_new", "id_corpus").as[(Long, Long)].collect().toSet
    assert(got == Set((10L, 1L), (10L, 2L)))
  }
}
