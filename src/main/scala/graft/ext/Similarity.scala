package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import scala.util.Random

/** Similarity search over embedding columns (`array<float>`):
  * brute-force cosine top-k as the exact baseline, and a random-hyperplane
  * LSH-bucketed variant as the scale path.
  *
  * Scale design: the brute-force path broadcasts the (small) query set so
  * the corpus is scanned exactly once with no shuffle until the final
  * per-query top-k (a windowed rank over |queries|·k rows). The LSH path
  * replaces the full scan with an equi-join on signature buckets —
  * corpus-size-independent probe cost per query.
  */
object Similarity {

  /** All arithmetic in double: float32 inputs upcast once, keeping results
    * reproducible across engines.
    */
  private def asDouble(vec: Column): Column =
    transform(vec, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))

  /** Cosine similarity, rounded to 6 decimals so last-ulp float noise
    * cannot reorder near-ties across engines.
    */
  def cosine(a: Column, b: Column): Column = {
    val ad = asDouble(a); val bd = asDouble(b)
    round(dot(ad, bd) / (norm(ad) * norm(bd)), 6)
  }

  /** Exact brute-force top-k: for every query row, the k nearest corpus
    * rows by cosine (self-matches excluded). Queries are broadcast; ranking
    * ties break deterministically by corpus id.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qvec"), col("cvec")).as("sim"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "sim")
  }

  /** Deterministic random hyperplanes (seeded), shipped as literals. */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Random-hyperplane signature: bit i = sign(vec · plane_i), folded into
    * one long (nPlanes ≤ 63). Pure projection.
    */
  def rhpSignature(vec: Column, planes: Seq[Seq[Double]]): Column = {
    val vd = asDouble(vec)
    val bits = planes.map { p =>
      when(dot(vd, typedlit(p)) >= 0, 1L).otherwise(0L)
    }
    bits.reduce((acc, b) => acc * 2 + b)
  }

  /** LSH-bucketed approximate top-k: candidates share the query's signature
    * bucket (multi-probed: all buckets within Hamming distance 1, i.e.
    * nPlanes+1 probes per query), then exact cosine rerank of candidates
    * only. Recall tuned via nPlanes (fewer planes → bigger buckets →
    * higher recall, more rerank work).
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, nPlanes: Int = 12,
              seed: Long = 42L): DataFrame = {
    val dim = 64 // embeddings table layout; parameterize when schema varies
    val planes = hyperplanes(nPlanes, dim, seed)
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"),
      rhpSignature(col(vecCol), planes).as("bucket"))
    // query probes: own bucket + all single-bit flips
    val probes = (-1 until nPlanes).map { bit =>
      val base = rhpSignature(col(vecCol), planes)
      val probe = if (bit < 0) base
        else base.bitwiseXOR(lit(1L << bit))
      queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"),
        probe.as("bucket"))
    }.reduce(_ unionByName _)
    val scored = c.join(probes, "bucket")
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qvec"), col("cvec")).as("sim"))
      .distinct()
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "sim")
  }
}
