package graft

import graft.ext.Dedup
import org.apache.spark.sql.functions._

class CosineNearDupSpec extends SparkSpec {
  import spark.implicits._

  // two tight clusters + one isolated vector
  private val emb = Seq(
    (0L, Seq(1.0f, 0.0f, 0.0f)),
    (1L, Seq(0.99f, 0.01f, 0.0f)),
    (2L, Seq(0.0f, 1.0f, 0.0f)),
    (3L, Seq(0.01f, 0.99f, 0.0f)),
    (4L, Seq(0.0f, 0.0f, 1.0f))
  ).toDF("vec_id", "embedding")

  test("exact pairs: only intra-cluster pairs pass a high threshold") {
    val pairs = Dedup.cosineNearDupPairsExact(emb, "vec_id", "embedding", 0.95, dim = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L), (2L, 3L)))
  }

  test("exact pairs carry rounded cosine values") {
    val c = Dedup.cosineNearDupPairsExact(emb, "vec_id", "embedding", 0.95, dim = 3)
      .filter(col("id_a") === 0L).select("cosine").as[Double].head()
    assert(c > 0.99 && c <= 1.0)
  }

  test("LSH variant finds the same pairs on clustered data (dim=3)") {
    val pairs = Dedup.cosineNearDupPairsLsh(emb, "vec_id", "embedding",
        minCosine = 0.95, nPlanes = 4, nTables = 8, dim = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L), (2L, 3L)))
  }

  test("LSH variant recall on the real embeddings slice") {
    val real = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val exact = pairs(Dedup.cosineNearDupPairsExact(real, "vec_id", "embedding", 0.4))
    // threshold 0.4 on random gaussian vectors is the adversarial case for
    // rhp-LSH (barely-correlated pairs); 4-bit buckets x 8 tables gives
    // P(candidate) ≈ 0.75 per true pair
    val lsh = pairs(Dedup.cosineNearDupPairsLsh(real, "vec_id", "embedding",
      0.4, nPlanes = 4, nTables = 8))
    assert(lsh.subsetOf(exact)) // verification step admits no false positives
    val recall = if (exact.isEmpty) 1.0 else (exact & lsh).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall $recall")
  }

  test("portable variant is exactly the bucket-mate subset of exact pairs") {
    // the portable member (q88) trades multi-table recall for
    // oracle-checkability: its result must EQUAL the exact relation
    // restricted to same-signature pairs — signatures recomputed here
    // from the independently-derived md5 plane matrix (the derivation
    // itself is reference-pinned in SimilaritySpec)
    graft.plans.GraftFunctions.register(spark)
    val real = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val planes = (0 until 4).map { p => (0 until 64).map { j =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"graft:rhp:$p:$j".getBytes("UTF-8"))
      if ((h(0) & 0x80) != 0) 1.0 else -1.0 } }
    val sig = real.select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .as[(Long, Seq[Double])].collect().map { case (id, v) =>
        id -> planes.map { p =>
          if (v.lazyZip(p).map(_ * _).sum >= 0) '1' else '0' }.mkString
      }.toMap
    val exact = pairs(
      Dedup.cosineNearDupPairsExact(real, "vec_id", "embedding", 0.4))
    val portable = pairs(Dedup.cosineNearDupPairsLshPortable(
      real, "vec_id", "embedding", minCosine = 0.4, nPlanes = 4))
    val expected = exact.filter { case (a, b) => sig(a) == sig(b) }
    assert(portable == expected)
  }
}
