package graft.ext

import graft.plans.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** IVF-PQ approximate nearest neighbor — the third index family next to
  * RHP-LSH ([[Similarity.lshTopK]]) and plain IVF ([[Ivf.ivfTopK]]),
  * and the one that changes the STORAGE story: each corpus vector is
  * compressed to `m` small integer codes (8 ints here vs 64 floats —
  * and 8 BYTES on disk/wire once dictionary-encoded), so candidate
  * scoring at 100 TB never touches raw vectors. FAISS's IndexIVFPQ is
  * the reference architecture (public knowledge; no code consulted).
  *
  * Recipe: vectors are L2-normalized (squared-L2 then equals 2−2·cos,
  * so PQ ordering tracks the cosine ordering the whole ANN family
  * uses), split into `m` subspaces of `dsub` dims; per subspace a
  * driver-trained k-means codebook of `ksub` centroids quantizes the
  * subvector to its nearest centroid id. A query builds an
  * `m × ksub` lookup table of exact subspace distances; a candidate's
  * approximate distance is `m` table gathers — the native
  * [[graft.plans.PqAdcExpr]].
  *
  * Search = IVF coarse candidates (equi-join on list id, codes ride
  * along — ids+codes only, never vectors) → ADC shortlist per query →
  * exact cosine rerank of the shortlist only. Training is
  * sample-bounded on the driver like [[Ivf.trainCentroids]];
  * everything downstream is projections + one equi-join + windowed
  * top-k.
  */
object Pq {

  /** Per-subspace k-means codebooks on a deterministic hash-ordered
    * sample of L2-NORMALIZED vectors. Returns the flat row-major
    * `[sub][centroid][dim]` matrix (m·ksub·dsub doubles). Plain L2
    * Lloyd per subspace — subvectors of unit vectors are NOT unit, so
    * spherical updates would be wrong here.
    */
  def trainCodebooks(emb: DataFrame, vecCol: String, m: Int, ksub: Int,
                     dim: Int, sampleSize: Int = 20000,
                     iters: Int = 10): Array[Double] = {
    require(dim % m == 0, s"dim $dim must split into m=$m subspaces")
    val dsub = dim / m
    import emb.sparkSession.implicits._
    val sample: Array[Array[Double]] = emb
      .select(transform(col(vecCol), x => x.cast("double")).as("v"))
      .filter(size(col("v")) === dim)
      .withColumn("__h", hash(col("v")))
      .orderBy("__h")
      .limit(sampleSize)
      .select("v").as[Seq[Double]].collect()
      .map { s =>
        val a = s.toArray
        var n2 = 0.0; var j = 0
        while (j < a.length) { n2 += a(j) * a(j); j += 1 }
        if (n2 > 0) { val inv = 1.0 / math.sqrt(n2); a.map(_ * inv) } else a
      }
    require(sample.nonEmpty, "cannot train PQ codebooks on an empty corpus")

    val out = new Array[Double](m * ksub * dsub)
    var s = 0
    while (s < m) {
      val sub = sample.map(v => java.util.Arrays.copyOfRange(v, s * dsub, (s + 1) * dsub))
      val k = math.min(ksub, sub.length)
      val stride = math.max(1, sub.length / k)
      val cents = Array.tabulate(k)(i => sub(i * stride).clone())
      var it = 0
      while (it < iters) {
        val sums = Array.fill(k)(new Array[Double](dsub))
        val counts = new Array[Int](k)
        sub.foreach { v =>
          var best = 0; var bestD = Double.PositiveInfinity
          var c = 0
          while (c < k) {
            var d = 0.0; var j = 0
            while (j < dsub) { val diff = v(j) - cents(c)(j); d += diff * diff; j += 1 }
            if (d < bestD) { best = c; bestD = d }
            c += 1
          }
          var j = 0
          while (j < dsub) { sums(best)(j) += v(j); j += 1 }
          counts(best) += 1
        }
        var c = 0
        while (c < k) {
          if (counts(c) > 0) cents(c) = sums(c).map(_ / counts(c))
          c += 1
        }
        it += 1
      }
      var c = 0
      while (c < k) {
        System.arraycopy(cents(c), 0, out, (s * ksub + c) * dsub, dsub)
        c += 1
      }
      s += 1
    }
    out
  }

  /** PQ codes for a vector column (native [[graft.plans.PqEncodeExpr]];
    * requires `GraftFunctions.register(spark)`).
    */
  def encode(vec: Column, codebooks: Array[Double], m: Int, dsub: Int,
             ksub: Int): Column =
    call_function("graft_pq_encode", vec, typedlit(codebooks.toSeq),
      lit(m), lit(dsub), lit(ksub))

  /** A query's ADC lookup table: `lut[sub*ksub + c]` = squared L2
    * between the query's (normalized) subvector and centroid `c` of
    * subspace `sub`.
    */
  def lutFor(q: Array[Double], codebooks: Array[Double], m: Int, dsub: Int,
             ksub: Int): Array[Double] = {
    var n2 = 0.0; var j = 0
    while (j < q.length) { n2 += q(j) * q(j); j += 1 }
    val inv = if (n2 > 0) 1.0 / math.sqrt(n2) else 1.0
    val lut = new Array[Double](m * ksub)
    var s = 0
    while (s < m) {
      var c = 0
      while (c < ksub) {
        val off = (s * ksub + c) * dsub
        var d = 0.0
        j = 0
        while (j < dsub) {
          val diff = q(s * dsub + j) * inv - codebooks(off + j)
          d += diff * diff
          j += 1
        }
        lut(s * ksub + c) = d
        c += 1
      }
      s += 1
    }
    lut
  }

  /** IVF-PQ top-k: coarse IVF lists give candidates, ADC over PQ codes
    * shortlists `k · rerankFactor` per query, exact cosine reranks the
    * shortlist to the final k. The queries frame is collected to the
    * driver to build per-query LUTs — queries are a small batch by
    * contract (same assumption the LUT-based ADC design itself makes).
    */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                vecCol: String, k: Int, nList: Int = 64, nProbe: Int = 8,
                m: Int = 8, ksub: Int = 16, dim: Int = 64,
                rerankFactor: Int = 4, sampleSize: Int = 20000,
                iters: Int = 10): DataFrame = {
    val spark = corpus.sparkSession
    GraftFunctions.register(spark)
    val dsub = dim / m
    val coarse = Ivf.trainCentroids(corpus, vecCol, nList, dim, sampleSize, iters)
    val codebooks = trainCodebooks(corpus, vecCol, m, ksub, dim, sampleSize, iters)

    // corpus side: ids + coarse list + PQ codes — never raw vectors
    val encoded = corpus.select(col(idCol).as("neighbor_id"),
      element_at(Ivf.assignLists(col(vecCol), coarse, dim, 1), 1).as("list"),
      encode(col(vecCol), codebooks, m, dsub, ksub).as("codes"))

    // query side: collected (small batch), probes + LUT per query
    import spark.implicits._
    val qRows: Array[(Long, Array[Double])] = queries
      .select(col(idCol).cast("long"),
        transform(col(vecCol), x => x.cast("double")))
      .as[(Long, Seq[Double])].collect()
      .map { case (id, v) => (id, v.toArray) }
    val qDf = qRows.toSeq.map { case (id, v) =>
      (id, lutFor(v, codebooks, m, dsub, ksub).toSeq)
    }.toDF("query_id", "lut")
    val qProbes = queries.select(col(idCol).cast("long").as("query_id"),
      explode(Ivf.assignLists(col(vecCol), coarse, dim, nProbe)).as("list"))

    val shortlist = encoded
      .join(qProbes, "list")
      .filter(col("neighbor_id") =!= col("query_id"))
      .join(broadcast(qDf), "query_id")
      .withColumn("adc",
        call_function("graft_pq_adc", col("codes"), col("lut"), lit(ksub)))
      .filter(col("adc").isNotNull)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("adc").asc, col("neighbor_id").asc)
    val cands = shortlist
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") <= k * rerankFactor)
      .select("query_id", "neighbor_id")

    Similarity.rerankTopK(cands, corpus, queries, idCol, vecCol, k, dim,
      useNative = true)
  }
}
