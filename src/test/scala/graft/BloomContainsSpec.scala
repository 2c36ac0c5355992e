package graft

import graft.ext.Dedup
import graft.plans.GraftFunctions
import org.apache.spark.sql.functions._

class BloomContainsSpec extends SparkSpec {
  import spark.implicits._

  GraftFunctions.register(spark)

  private def bloomBytesOf(values: Seq[String]): Array[Byte] = {
    val bf = values.toDF("s").stat.bloomFilter("s", values.size.toLong, 0.01)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  test("no false negatives: every inserted string probes true") {
    val inserted = (0 until 500).map(i => s"shingle-$i")
    val bytes = bloomBytesOf(inserted)
    val misses = inserted.toDF("s")
      .filter(!call_function("graft_bloom_contains", col("s"), lit(bytes)))
      .count()
    assert(misses == 0L, "a Bloom filter must never reject an inserted item")
  }

  test("false-positive rate on absent strings is near the configured fpp") {
    val bytes = bloomBytesOf((0 until 500).map(i => s"shingle-$i"))
    val falsePos = (0 until 2000).map(i => s"absent-$i").toDF("s")
      .filter(call_function("graft_bloom_contains", col("s"), lit(bytes)))
      .count()
    // fpp=0.01 over 2000 probes ≈ 20 expected; 100 = 5× slack, still
    // catches a broken hash path (which yields ~0 or ~2000)
    assert(falsePos < 100L, s"$falsePos false positives out of 2000")
  }

  test("long input path probes the same filter the long insert built") {
    val longs = (0L until 300L).map(_ * 7L)
    val bf = longs.toDF("v").stat.bloomFilter("v", 300L, 0.01)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    val bytes = bos.toByteArray
    val misses = longs.toDF("v")
      .filter(!call_function("graft_bloom_contains", col("v"), lit(bytes)))
      .count()
    assert(misses == 0L)
  }

  test("null input yields null, not a probe of garbage") {
    val bytes = bloomBytesOf(Seq("x"))
    val out = Seq(Some("x"), None).toDF("s")
      .select(call_function("graft_bloom_contains", col("s"), lit(bytes)))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getBoolean(0)))
    assert(out.toSeq == Seq(Some(true), None))
  }

  test("non-string/long input is rejected at analysis") {
    val bytes = bloomBytesOf(Seq("x"))
    val err = intercept[Exception] {
      Seq(1.5).toDF("d")
        .select(call_function("graft_bloom_contains", col("d"), lit(bytes)))
        .collect()
    }
    assert(err.getMessage.contains("graft_bloom_contains"))
  }

  test("contaminationHitsBloom equals the exact operator (oracle relation)") {
    val docs = Seq(
      (1L, "one two three four five six seven eight nine ten"),
      (2L, "one two three four five six seven eight different tail"),
      (3L, "totally unrelated words that share nothing with the bench"),
      (31L, "one two three four five six seven eight nine ten and more")
    ).toDF("doc_id", "text")
    val corpus = docs.filter($"doc_id" =!= 31L)
    val bench = docs.filter($"doc_id" === 31L)
    val exact = Dedup.contaminationHits(corpus, "doc_id", "text", bench,
        shingleN = 8)
      .as[(Long, Long)].collect().toMap
    val bloom = Dedup.contaminationHitsBloom(corpus, "doc_id", "text", bench,
        shingleN = 8, expectedItems = 1000L, fpp = 0.01)
      .as[(Long, Long)].collect().toMap
    assert(exact.nonEmpty, "fixture must actually produce contamination hits")
    assert(bloom == exact)
  }
}
