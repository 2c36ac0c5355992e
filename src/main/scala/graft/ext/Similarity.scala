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

  /** LSH-bucketed approximate top-k: standard multi-table random-hyperplane
    * LSH. Each of `nTables` independent tables hashes every vector to an
    * `nPlanes`-bit bucket; candidates are corpus rows sharing a bucket with
    * the query in ANY table (single-bit multi-probe included), then exact
    * cosine reranks the candidate set only.
    *
    * Recall/cost dial: more tables or fewer planes → higher recall, more
    * rerank work. All tables are generated in ONE projection per side
    * (an array of (table, bucket) structs, exploded) so the corpus is still
    * scanned once; the only shuffle is the bucket equi-join + final top-k.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, nPlanes: Int = 12, nTables: Int = 4,
              seed: Long = 42L): DataFrame = {
    val dim = 64 // embeddings table layout; parameterize when schema varies
    val tables = (0 until nTables).map(t =>
      t -> hyperplanes(nPlanes, dim, seed + t))

    def corpusKeys(vec: Column): Column = array(tables.map { case (t, planes) =>
      struct(lit(t).as("tbl"), rhpSignature(vec, planes).as("bucket"))
    }: _*)

    // query probes: per table, own bucket + all single-bit flips
    def queryKeys(vec: Column): Column = array(tables.flatMap { case (t, planes) =>
      val base = rhpSignature(vec, planes)
      (-1 until nPlanes).map { bit =>
        val probe = if (bit < 0) base else base.bitwiseXOR(lit(1L << bit))
        struct(lit(t).as("tbl"), probe.as("bucket"))
      }
    }: _*)

    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"),
        explode(corpusKeys(col(vecCol))).as("key"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"),
        explode(queryKeys(col(vecCol))).as("key"))
    val scored = c.join(q, "key")
      .filter(col("neighbor_id") =!= col("query_id"))
      .select("query_id", "neighbor_id", "qvec", "cvec")
      .distinct() // dedup candidates BEFORE the (costlier) cosine
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qvec"), col("cvec")).as("sim"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "sim")
  }
}
