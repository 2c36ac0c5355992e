package graft

import org.apache.spark.sql.functions._

/** Invariant gates for q75_kmeans, the md5-derandomized k-means++
  * trainer ([[graft.ext.Ivf.kmeansPlusPlusStats]]). Since round 10 the
  * query is ORACLE-CHECKED (the seeding draws and Lloyd steps replay in
  * DuckDB), so the recorded-md5 pin this spec used to carry is
  * superseded by the driver's hash gate; what remains here are the
  * model-quality and determinism invariants an oracle replay cannot
  * express:
  *  - two back-to-back runs are bit-identical (the derandomized draw
  *    chain has no hidden order dependence);
  *  - the seed draw returns nList DISTINCT ids (a repeated seed would
  *    duplicate a centroid — the failure the explicit exclusion
  *    prevents);
  *  - every corpus vector lands in exactly one cluster (Σn = corpus);
  *  - mean cosine to the trained centroid beats the corpus-mean
  *    baseline in every cluster (training moved the centroids toward
  *    their members — the "is it actually k-means" check).
  */
class KmeansPinSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("q75 is bit-deterministic across back-to-back runs") {
    val a = SparkEntry.queries("q75_kmeans")(spark, dir).collect().toSeq
    val b = SparkEntry.queries("q75_kmeans")(spark, dir).collect().toSeq
    assert(a == b)
  }

  test("kppSeedIds returns nList distinct corpus ids") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val ids = graft.ext.Ivf.kppSeedIds(emb, "vec_id", "embedding", nList = 8)
    assert(ids.size == 8)
    assert(ids.distinct.size == 8, s"repeated seed in $ids")
    val corpus = emb.select("vec_id").as[Long](spark.implicits.newLongEncoder)
      .collect().toSet
    assert(ids.forall(corpus), s"seed outside the corpus: $ids")
  }

  test("q75 clusters partition the corpus and beat the mean-cos baseline") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val rows = SparkEntry.queries("q75_kmeans")(spark, dir).collect()
    assert(rows.length >= 2 && rows.length <= 8,
      s"expected 2..8 clusters, got ${rows.length}")
    assert(rows.map(_.getLong(1)).sum == emb.count(),
      "cluster sizes must sum to the corpus")
    // baseline: mean pairwise-to-global-mean cosine is ~0 for spread
    // vectors; a trained centroid should explain its members far better
    rows.foreach { r =>
      val mean = r.getLong(2)
      assert(mean > 100000L && mean <= 1000000L,
        s"cluster ${r.getLong(0)}: implausible mean_cos_micro $mean")
    }
  }
}
