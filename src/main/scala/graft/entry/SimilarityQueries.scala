package graft.entry

/** ANN over the embeddings table: brute-force
  * baseline, RHP-LSH, IVF (trained + exemplar), PQ, int8, Matryoshka.
  *
  * One slice of [[graft.SparkEntry]]'s catalog: `queries` and the
  * matching DuckDB `oracleSql` live side by side so an edit to a
  * query and its oracle is always a same-file change.
  */
import graft.entry.EntryTables._
import graft.ext.{Dedup, Multimodal, Retrieval, Similarity, TextOps}
import graft.model.{ColumnSpec, FkRef, TableConfig}
import graft.ops.{Merge, Normalize, TemporalJoin}
import graft.rules.Rules
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

private[graft] object SimilarityQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- brute-force cosine top-k (exact ANN baseline; native DotExpr,
    // bit-identical to the unrolled chain — spec-pinned) ----------------------
    "q30_topk_cosine" -> ((s, dir) => {
      graft.plans.GraftFunctions.register(s)
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") % 100 === 0)
      Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 5,
          dim = Some(64), useNative = true)
        .orderBy("query_id", "rank")
    }),

    // ---- LSH-bucketed approximate top-k, ORACLE-CHECKED since
    // round 10: the multi-table OR-construction (the Gaussian family's
    // distinguishing feature) DERANDOMIZED — md5-derived ±1 planes per
    // table, union-of-bucket-mates candidates, exact rerank. The
    // seeded-Gaussian `lshTopK` stays the perf API (recall
    // spec-pinned); hyperparameters retuned 1×10 → 4×6 planes with the
    // conversion — deliberate-semantic-change protocol, old pin
    // b7aa123c78a891b2f354188462e8d69a rows=25.
    "q31_topk_lsh" -> ((s, dir) => {
      graft.plans.GraftFunctions.register(s)
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") % 100 === 0)
      Similarity.lshTopKPortableMulti(emb, queries, "vec_id", "embedding",
          k = 5, nTables = 4, nPlanes = 6)
        .orderBy("query_id", "rank")
    }),

    // ---- IVF (k-means coarse-quantizer) approximate top-k,
    // ORACLE-CHECKED since round 10: the TRAINED quantizer itself is
    // the md5-derandomized k-means++ model q75 trains (shared oracle
    // prefix), so assignment, probing and rerank all replay in DuckDB.
    // (The murmur3-sampled driver trainer `ivfTopK` remains the
    // API for perf-critical callers — IvfSpec still pins it; the
    // catalog member is the cross-engine-checkable trained form.
    // Hyperparameters retuned 32/8 → 8/2 with the conversion — the
    // deliberate-semantic-change re-record protocol, old pin
    // a465e1d78d27cc29fbc3a9624519737d rows=25.)
    "q43_topk_ivf" -> ((s, dir) => {
      graft.plans.GraftFunctions.register(s)
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") % 100 === 0)
      graft.ext.Ivf.ivfTopKSeeded(emb, queries, "vec_id", "embedding",
          k = 5, nList = 8, nProbe = 2, iters = 2)
        .orderBy("query_id", "rank")
    }),

    // ---- IVF, oracle-checked member (hash-checked): exemplar centroids
    // (nList lowest-id vectors, Forgy init without Lloyd) make the whole
    // assign-probe-rerank shape plain relational algebra, so the IVF
    // candidate-generation + exact-rerank pipeline itself is verified
    // cross-engine; q43 is the trained-quantizer variant (itself
    // oracle-checked since round 10 via the seeded trainer)
    "q85_topk_ivf_exemplar" -> ((s, dir) => {
      graft.plans.GraftFunctions.register(s)
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") % 100 === 0)
      graft.ext.Ivf.ivfTopKExemplar(emb, queries, "vec_id", "embedding",
          k = 5, nList = 8, nProbe = 2)
        .orderBy("query_id", "rank")
    }),

    // ---- IVF × int8 three-tier funnel, exemplar member (oracle-checked):
    // bucket (probed lists) → quantized prune (int8 dot, candK) → exact
    // rerank — the standard web-scale retrieval stack shape, verified
    // cross-engine end to end (composes q85's candidates with q112's scan).
    "q121_topk_ivf_int8" -> ((s, dir) => {
      graft.plans.GraftFunctions.register(s)
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") % 100 === 0)
      graft.ext.Ivf.ivfInt8TopKExemplar(emb, queries, "vec_id", "embedding",
          k = 5, nList = 8, nProbe = 2, dim = 64, candK = 20)
        .orderBy("query_id", "rank")
    }),

    // ---- LSH, oracle-checked member (hash-checked): md5-derived ±1
    // hyperplanes (portable across engines), single-table exact-signature
    // buckets, exact rerank — the bucket-then-rerank pipeline verified
    // cross-engine; q31 keeps the multi-table Gaussian family (rows-only,
    // recall-bounded)
    "q86_topk_lsh_portable" -> ((s, dir) => {
      graft.plans.GraftFunctions.register(s)
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") % 100 === 0)
      graft.ext.Similarity.lshTopKPortable(emb, queries, "vec_id",
          "embedding", k = 5, nPlanes = 4)
        .orderBy("query_id", "rank")
    }),

    // ---- PQ ADC, oracle-checked member (hash-checked): exemplar
    // codebooks (sub-vectors of the ksub lowest-id unit vectors), argmin
    // encode, ADC shortlist, exact rerank — the product-quantization
    // encode/ADC pipeline verified cross-engine; q79 keeps the trained
    // IVF-PQ with residual encoding (rows-only, recall-bounded)
    "q89_pq_adc_exemplar" -> ((s, dir) => {
      graft.plans.GraftFunctions.register(s)
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") % 100 === 0)
      graft.ext.Pq.pqAdcTopKExemplar(emb, queries, "vec_id", "embedding",
          k = 5, m = 8, ksub = 16)
        .orderBy("query_id", "rank")
    }),

    // ---- k-means, oracle-checked member (hash-checked): ONE spherical-
    // Lloyd refinement step from exemplar seeds — the training step
    // itself (unit-normalize → argmax-assign → DECIMAL per-dimension
    // mean → renormalize) verified cross-engine; q75 is the trained
    // multi-iteration model (itself oracle-checked since round 10)
    "q87_lloyd_step_exemplar" -> ((s, dir) => {
      graft.plans.GraftFunctions.register(s)
      graft.ext.Ivf.lloydStepExemplar(t(s, dir, "embeddings"), "vec_id",
          "embedding", nList = 8)
        .orderBy("list", "pos")
    }),

    // ---- k-means CONVERGENT training, oracle-checked (hash-checked):
    // two Lloyd steps from exemplar seeds as a relational fixpoint —
    // centroids stay a relation between steps (never collected), every
    // intermediate bit-stable cross-engine (DECIMAL means, IEEE
    // division/sqrt, sequential dots); the oracle unrolls both steps
    "q91_lloyd_iterate_exemplar" -> ((s, dir) => {
      graft.plans.GraftFunctions.register(s)
      graft.ext.Ivf.lloydIterateExemplar(t(s, dir, "embeddings"), "vec_id",
          "embedding", nList = 8, iters = 2)
        .orderBy("list", "pos")
    }),

    // ---- int8 scalar-quantized top-k (oracle-checked): the 4×-memory ANN
    // scan — per-vector symmetric quantization, exact-long candidate dot
    // (native Int8DotExpr, bit-identical to the HOF fold), float rerank of
    // the candK shortlist only. No trained state and no float-ordering
    // hazard in the scan, so the whole pipeline hash-checks cross-engine
    // (unlike LSH/IVF, which need exemplar twins).
    "q112_topk_int8" -> ((s, dir) => {
      graft.plans.GraftFunctions.register(s)
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") % 100 === 0)
      Similarity.int8TopK(emb, queries, "vec_id", "embedding", k = 5,
          dim = 64, candK = 20, useNative = true)
        .orderBy("query_id", "rank")
    }),

    // ---- quantization recall report (oracle-checked): the in-engine
    // EVALUATION a production ANN deployment runs after every
    // quantizer build — recall@5 of the int8 scan-and-rerank path
    // (q112) against the exact full-precision top-5 (q30), per query.
    // Both legs carry deterministic (rounded-sim, id) tie-breaks, so
    // the quality number itself is hash-checkable cross-engine: the
    // report is the artifact an operator watches for regressions, not
    // a spec assertion. One semi-join of two k-row-per-query lists +
    // two map-side-combining counts.
    "q189_quantization_recall" -> ((s, dir) => {
      graft.plans.GraftFunctions.register(s)
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") % 100 === 0)
      val exact = Similarity.bruteForceTopK(emb, queries, "vec_id",
          "embedding", k = 5, dim = Some(64), useNative = true)
        .select(col("query_id"), col("neighbor_id"))
      val approx = Similarity.int8TopK(emb, queries, "vec_id",
          "embedding", k = 5, dim = 64, candK = 20, useNative = true)
        .select(col("query_id"), col("neighbor_id"))
      val hits = exact.join(approx, Seq("query_id", "neighbor_id"),
          "left_semi")
        .groupBy(col("query_id")).agg(count(lit(1)).as("n_hits"))
      exact.groupBy(col("query_id")).agg(count(lit(1)).as("n_exact"))
        .join(hits, Seq("query_id"), "left")
        .withColumn("n_hits", coalesce(col("n_hits"), lit(0L)))
        .withColumn("recall_micro",
          expr("(1000000 * n_hits) div n_exact"))
        .orderBy("query_id")
    }),

    // ---- Matryoshka truncated-dim top-k (oracle-checked): prefix-16
    // cosine scan (4× less vector IO), full-64 exact rerank — like q112
    // deterministic end to end, so it hash-checks without an exemplar twin.
    "q115_topk_matryoshka" -> ((s, dir) => {
      graft.plans.GraftFunctions.register(s)
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") % 100 === 0)
      Similarity.truncatedTopK(emb, queries, "vec_id", "embedding", k = 5,
          dim = 64, prefixDim = 16, candK = 20, useNative = true)
        .orderBy("query_id", "rank")
    }),

    // ---- distributed spherical k-means, ORACLE-CHECKED since round 10:
    // md5-derandomized k-means++ seeding (integer inverse-CDF over the
    // exact D² distribution) + the q91 relational-fixpoint Lloyd steps
    // over the FULL corpus + an exact-integer per-cluster census — the
    // trained model itself now replays in DuckDB (the q139/q119
    // conversion pattern; q75 was rows-only for eight rounds because
    // its murmur3-ordered init had no cross-engine twin).
    "q75_kmeans" -> ((s, dir) => {
      graft.plans.GraftFunctions.register(s)
      graft.ext.Ivf.kmeansPlusPlusStats(t(s, dir, "embeddings"), "vec_id",
        "embedding", nList = 8, iters = 2, dim = 64)
    }),

    // ---- IVF-PQ ANN, ORACLE-CHECKED since round 10 — the LAST
    // rows-only query retired: coarse quantizer = the shared
    // md5-derandomized k-means++ model; per-subspace codebooks =
    // md5-Forgy seeds + relational L2-Lloyd steps on the RESIDUALS
    // (the load-bearing detail preserved); integer-micro ADC. The
    // driver-sampled `ivfPqTopK` with the native ADC gather stays the
    // perf API (PqSpec still pins it); hyperparameters retuned
    // 32/8/8x64 → 8/2/4x8 with the conversion — deliberate-semantic-
    // change protocol, old pin 2e3d3b8f1ae8c3c100253b9a75ca7a7b
    // rows=25.
    "q79_topk_ivfpq" -> ((s, dir) => {
      graft.plans.GraftFunctions.register(s)
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") % 100 === 0)
      graft.ext.Pq.ivfPqTopKSeeded(emb, queries, "vec_id", "embedding",
          k = 5, nList = 8, nProbe = 2, iters = 2, m = 4, ksub = 8,
          cbIters = 2, candK = 15)
        .orderBy("query_id", "rank")
    }),
  )


  /** The q75 oracle: the shared seeded-trainer prefix + the final
    * argmax assignment and integer per-cluster census. */
  private def kppKmeansOracleSql(nList: Int, iters: Int, dim: Int): String =
    s"""${EntryTables.kppLloydCtes(nList, iters, dim)},
       |fass AS (
       |  SELECT e.vec_id, c.cid,
       |    round(list_dot_product(e.v, c.cvec) / (e.nrm * c.cnrm), 6) AS sim
       |  FROM e CROSS JOIN l${iters}n c
       |  QUALIFY row_number() OVER (PARTITION BY e.vec_id
       |    ORDER BY round(list_dot_product(e.v, c.cvec) / (e.nrm * c.cnrm), 6) DESC,
       |             c.cid) = 1)
       |SELECT cid AS cluster_id, CAST(count(*) AS BIGINT) AS n,
       |  CAST(sum(CAST(round(sim * 1000000) AS BIGINT)) AS BIGINT)
       |    // CAST(count(*) AS BIGINT) AS mean_cos_micro
       |FROM fass GROUP BY cid ORDER BY cluster_id""".stripMargin

  /** The q43 oracle: the SAME trained centroids (shared prefix), then
    * the q85 probe shape under them — assignment and probing by
    * 6-decimal-rounded argmax cosine, candidates an equi-join on the
    * list id, exact rerank of the probed candidates only.
    */
  private def kppIvfOracleSql(nList: Int, iters: Int, dim: Int,
                              nProbe: Int, k: Int): String =
    s"""${EntryTables.kppLloydCtes(nList, iters, dim)},
       |assigned AS (
       |  SELECT e.vec_id AS neighbor_id, c.cid AS list
       |  FROM e CROSS JOIN l${iters}n c
       |  QUALIFY row_number() OVER (PARTITION BY e.vec_id
       |    ORDER BY round(list_dot_product(e.v, c.cvec) / (e.nrm * c.cnrm), 6) DESC,
       |             c.cid) = 1),
       |probes AS (
       |  SELECT e.vec_id AS query_id, c.cid AS list
       |  FROM e CROSS JOIN l${iters}n c
       |  WHERE e.vec_id % 100 = 0
       |  QUALIFY row_number() OVER (PARTITION BY e.vec_id
       |    ORDER BY round(list_dot_product(e.v, c.cvec) / (e.nrm * c.cnrm), 6) DESC,
       |             c.cid) <= $nProbe),
       |scored AS (
       |  SELECT p.query_id, a.neighbor_id,
       |    round(list_dot_product(qe.v, ne.v) / (qe.nrm * ne.nrm), 6) AS sim
       |  FROM assigned a JOIN probes p USING (list)
       |  JOIN e qe ON qe.vec_id = p.query_id
       |  JOIN e ne ON ne.vec_id = a.neighbor_id
       |  WHERE a.neighbor_id <> p.query_id)
       |SELECT query_id,
       |  row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS "rank",
       |  neighbor_id, sim
       |FROM scored
       |QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) <= $k
       |ORDER BY query_id, "rank"""".stripMargin

  /** The q79 oracle: the shared seeded coarse-quantizer prefix, then
    * the residual relation, per-subspace md5-Forgy + L2-Lloyd codebook
    * chains, argmin encode, integer-micro ADC and the exact-rerank
    * tail — the complete trained IVF-PQ replayed stage for stage.
    */
  private def kppPqOracleSql(nList: Int, iters: Int, dim: Int,
                             nProbe: Int, m: Int, ksub: Int,
                             cbIters: Int, candK: Int, k: Int): String = {
    val dsub = dim / m
    def residCte(name: String, idOut: String, where: String,
                 keep: String): String =
      s"""$name AS MATERIALIZED (
         |  SELECT e.vec_id AS $idOut, c.cid AS list,
         |    list_transform(range(1, ${dim + 1}), i ->
         |      e.v[i] / (CASE WHEN e.nrm > 0 THEN e.nrm ELSE 1 END)
         |        - c.cvec[i]) AS r
         |  FROM e CROSS JOIN l${iters}n c$where
         |  QUALIFY row_number() OVER (PARTITION BY e.vec_id
         |    ORDER BY round(list_dot_product(e.v, c.cvec) / (e.nrm * c.cnrm), 6) DESC,
         |             c.cid) $keep)""".stripMargin
    def sub(col: String, s: Int): String =
      s"$col[${s * dsub + 1}:${(s + 1) * dsub}]"
    val subChains = (0 until m).map { s =>
      val seed =
        s"""sd${s}0 AS MATERIALIZED (
           |  SELECT neighbor_id AS cwid, ${sub("r", s)} AS cw FROM asg
           |  ORDER BY md5('graft:pqseed:$s:' || neighbor_id), neighbor_id
           |  LIMIT $ksub)""".stripMargin
      val steps = (1 to cbIters).map { it =>
        s"""aa$s$it AS (
           |  SELECT w.cwid, ${sub("g.r", s)} AS rv
           |  FROM asg g CROSS JOIN sd$s${it - 1} w
           |  QUALIFY row_number() OVER (PARTITION BY g.neighbor_id
           |    ORDER BY round(list_distance(${sub("g.r", s)}, w.cw), 6),
           |             w.cwid) = 1),
           |mm$s$it AS (
           |  SELECT cwid, gs.pos,
           |    CAST(sum(CAST(rv[gs.pos] AS DECIMAL(30,12))) AS DOUBLE)
           |      / count(*) AS mv
           |  FROM aa$s$it CROSS JOIN generate_series(1, $dsub) gs(pos)
           |  GROUP BY 1, 2),
           |sd$s$it AS MATERIALIZED (
           |  SELECT cwid, list(mv ORDER BY pos) AS cw
           |  FROM mm$s$it GROUP BY cwid)""".stripMargin
      }.mkString(",\n")
      seed + ",\n" + steps
    }.mkString(",\n")
    val encArms = (0 until m).map { s =>
      s"""en$s AS (
         |  SELECT g.neighbor_id, $s AS s, w.cwid AS code
         |  FROM asg g CROSS JOIN sd$s$cbIters w
         |  QUALIFY row_number() OVER (PARTITION BY g.neighbor_id
         |    ORDER BY round(list_distance(${sub("g.r", s)}, w.cw), 6),
         |             w.cwid) = 1)""".stripMargin
    }.mkString(",\n")
    val encUnion = (0 until m).map(s => s"SELECT * FROM en$s")
      .mkString(" UNION ALL ")
    val lutArms = (0 until m).map { s =>
      s"""lu$s AS (
         |  SELECT p.query_id, p.list, $s AS s, w.cwid AS code,
         |    CAST(round(list_distance(${sub("p.r", s)}, w.cw) * 1000000)
         |      AS BIGINT) AS dm
         |  FROM prb p CROSS JOIN sd$s$cbIters w)""".stripMargin
    }.mkString(",\n")
    val lutUnion = (0 until m).map(s => s"SELECT * FROM lu$s")
      .mkString(" UNION ALL ")
    s"""${EntryTables.kppLloydCtes(nList, iters, dim)},
       |${residCte("asg", "neighbor_id", "", "= 1")},
       |${residCte("prb", "query_id", "\n  WHERE e.vec_id % 100 = 0", s"<= $nProbe")},
       |$subChains,
       |$encArms,
       |enc AS MATERIALIZED ($encUnion),
       |$lutArms,
       |lut AS MATERIALIZED ($lutUnion),
       |cand AS (
       |  SELECT p.query_id, p.list, a.neighbor_id
       |  FROM asg a JOIN prb p USING (list)
       |  WHERE a.neighbor_id <> p.query_id),
       |adc AS (
       |  SELECT c.query_id, c.neighbor_id, CAST(sum(l.dm) AS BIGINT) AS approx
       |  FROM cand c
       |  JOIN enc n ON n.neighbor_id = c.neighbor_id
       |  JOIN lut l ON l.query_id = c.query_id AND l.list = c.list
       |    AND l.s = n.s AND l.code = n.code
       |  GROUP BY 1, 2),
       |shortlist AS (
       |  SELECT query_id, neighbor_id FROM adc
       |  QUALIFY row_number() OVER (PARTITION BY query_id
       |    ORDER BY approx, neighbor_id) <= $candK),
       |scored AS (
       |  SELECT sl.query_id, sl.neighbor_id,
       |    round(list_dot_product(qe.v, ne.v) / (qe.nrm * ne.nrm), 6) AS sim
       |  FROM shortlist sl
       |  JOIN e qe ON qe.vec_id = sl.query_id
       |  JOIN e ne ON ne.vec_id = sl.neighbor_id)
       |SELECT query_id,
       |  row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS "rank",
       |  neighbor_id, sim
       |FROM scored
       |QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) <= $k
       |ORDER BY query_id, "rank"""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(

    "q75_kmeans" -> kppKmeansOracleSql(nList = 8, iters = 2, dim = 64),

    "q79_topk_ivfpq" -> kppPqOracleSql(nList = 8, iters = 2, dim = 64,
      nProbe = 2, m = 4, ksub = 8, cbIters = 2, candK = 15, k = 5),

    "q43_topk_ivf" ->
      kppIvfOracleSql(nList = 8, iters = 2, dim = 64, nProbe = 2, k = 5),

    // the shared multi-table ±1 signature CTEs, OR-construction
    // candidates (DISTINCT — a pair colliding in several tables counts
    // once), the q30 exact-rerank tail
    "q31_topk_lsh" ->
      s"""WITH ${EntryTables.rhpMultiSigCtes(nTables = 4, nPlanes = 6, dim = 64)},
         |cands AS (
         |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
         |  FROM sigs q JOIN sigs c ON q.t = c.t AND q.sig = c.sig
         |  WHERE q.vec_id % 100 = 0 AND c.vec_id <> q.vec_id),
         |scored AS (
         |  SELECT cands.query_id, cands.neighbor_id,
         |    round(list_dot_product(qe.v, ne.v) / (qe.nrm * ne.nrm), 6) AS sim
         |  FROM cands
         |  JOIN e qe ON qe.vec_id = cands.query_id
         |  JOIN e ne ON ne.vec_id = cands.neighbor_id)
         |SELECT query_id,
         |  row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS "rank",
         |  neighbor_id, sim
         |FROM scored
         |QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) <= 5
         |ORDER BY query_id, "rank"""".stripMargin,

    "q30_topk_cosine" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qvec
        |           FROM embeddings WHERE vec_id % 100 = 0),
        |scored AS (
        |  SELECT q.query_id, e.vec_id AS neighbor_id,
        |    round(list_dot_product(q.qvec::DOUBLE[], e.embedding::DOUBLE[]) /
        |      (sqrt(list_dot_product(q.qvec::DOUBLE[], q.qvec::DOUBLE[])) *
        |       sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))), 6) AS sim
        |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id)
        |SELECT query_id,
        |  row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS "rank",
        |  neighbor_id, sim
        |FROM scored
        |QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) <= 5
        |ORDER BY query_id, "rank"""".stripMargin,

    // q30's exact leg + q112's int8 leg composed (CTEs renamed apart),
    // intersected per query — recall itself in exact integer micro
    "q189_quantization_recall" ->
      """WITH xq AS (SELECT vec_id AS query_id, embedding AS qvec
        |            FROM embeddings WHERE vec_id % 100 = 0),
        |xsc AS (
        |  SELECT xq.query_id, e.vec_id AS neighbor_id,
        |    round(list_dot_product(xq.qvec::DOUBLE[], e.embedding::DOUBLE[]) /
        |      (sqrt(list_dot_product(xq.qvec::DOUBLE[], xq.qvec::DOUBLE[])) *
        |       sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))), 6) AS sim
        |  FROM embeddings e CROSS JOIN xq WHERE e.vec_id <> xq.query_id),
        |xtk AS (
        |  SELECT query_id, neighbor_id FROM xsc
        |  QUALIFY row_number() OVER (PARTITION BY query_id
        |    ORDER BY sim DESC, neighbor_id) <= 5),
        |quant AS (
        |  SELECT vec_id,
        |    embedding::DOUBLE[] AS v,
        |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm,
        |    list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) AS qmax,
        |    CASE WHEN list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) = 0
        |      THEN list_transform(embedding::DOUBLE[], x -> CAST(0 AS BIGINT))
        |      ELSE list_transform(embedding::DOUBLE[], x -> CAST(round(
        |        x * 127.0 / list_max(list_transform(embedding::DOUBLE[], y -> abs(y)))
        |      ) AS BIGINT)) END AS qvec
        |  FROM embeddings),
        |iq AS (SELECT * FROM quant WHERE vec_id % 100 = 0),
        |icand AS (
        |  SELECT iq.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    round((iq.qmax / 127.0) * (c.qmax / 127.0) *
        |      list_dot_product(iq.qvec::DOUBLE[], c.qvec::DOUBLE[]) /
        |      (iq.nrm * c.nrm), 6) AS approx_sim
        |  FROM quant c CROSS JOIN iq WHERE c.vec_id <> iq.vec_id),
        |ishort AS (
        |  SELECT query_id, neighbor_id FROM icand
        |  QUALIFY row_number() OVER (PARTITION BY query_id
        |    ORDER BY approx_sim DESC, neighbor_id) <= 20),
        |iscored AS (
        |  SELECT s.query_id, s.neighbor_id,
        |    round(list_dot_product(qe.v, ce.v) / (qe.nrm * ce.nrm), 6) AS sim
        |  FROM ishort s
        |  JOIN quant qe ON qe.vec_id = s.query_id
        |  JOIN quant ce ON ce.vec_id = s.neighbor_id),
        |itk AS (
        |  SELECT query_id, neighbor_id FROM iscored
        |  QUALIFY row_number() OVER (PARTITION BY query_id
        |    ORDER BY sim DESC, neighbor_id) <= 5),
        |hits AS (SELECT x.query_id, CAST(count(*) AS BIGINT) AS n_hits
        |  FROM xtk x JOIN itk i ON i.query_id = x.query_id
        |    AND i.neighbor_id = x.neighbor_id GROUP BY 1),
        |base AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_exact
        |  FROM xtk GROUP BY 1)
        |SELECT b.query_id, b.n_exact, coalesce(h.n_hits, 0) AS n_hits,
        |  (1000000 * coalesce(h.n_hits, 0)) // b.n_exact AS recall_micro
        |FROM base b LEFT JOIN hits h ON h.query_id = b.query_id
        |ORDER BY b.query_id""".stripMargin,

    // int8 quantization in SQL: same expression SHAPES as the Spark side
    // (x * 127.0 / qmax left-associated; (qs/127)·(cs/127)·idot / (qn·cn))
    // so every IEEE-double intermediate is bit-identical; the candidate
    // dot itself is exact-integer, hazard-free by construction
    "q112_topk_int8" ->
      """WITH quant AS (
        |  SELECT vec_id,
        |    embedding::DOUBLE[] AS v,
        |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm,
        |    list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) AS qmax,
        |    CASE WHEN list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) = 0
        |      THEN list_transform(embedding::DOUBLE[], x -> CAST(0 AS BIGINT))
        |      ELSE list_transform(embedding::DOUBLE[], x -> CAST(round(
        |        x * 127.0 / list_max(list_transform(embedding::DOUBLE[], y -> abs(y)))
        |      ) AS BIGINT)) END AS qvec
        |  FROM embeddings),
        |q AS (SELECT * FROM quant WHERE vec_id % 100 = 0),
        |cand AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    round((q.qmax / 127.0) * (c.qmax / 127.0) *
        |      list_dot_product(q.qvec::DOUBLE[], c.qvec::DOUBLE[]) /
        |      (q.nrm * c.nrm), 6) AS approx_sim
        |  FROM quant c CROSS JOIN q WHERE c.vec_id <> q.vec_id),
        |shortlist AS (
        |  SELECT query_id, neighbor_id FROM cand
        |  QUALIFY row_number() OVER (PARTITION BY query_id
        |    ORDER BY approx_sim DESC, neighbor_id) <= 20),
        |scored AS (
        |  SELECT s.query_id, s.neighbor_id,
        |    round(list_dot_product(qe.v, ce.v) / (qe.nrm * ce.nrm), 6) AS sim
        |  FROM shortlist s
        |  JOIN quant qe ON qe.vec_id = s.query_id
        |  JOIN quant ce ON ce.vec_id = s.neighbor_id)
        |SELECT query_id,
        |  row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS "rank",
        |  neighbor_id, sim
        |FROM scored
        |QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) <= 5
        |ORDER BY query_id, "rank"""".stripMargin,

    // prefix slice v[1:16] scores the scan; full vectors rerank — same
    // left-associated list_dot_product accumulation as the Spark side
    "q115_topk_matryoshka" ->
      """WITH base AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v,
        |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm,
        |    sqrt(list_dot_product(list_slice(embedding::DOUBLE[], 1, 16),
        |      list_slice(embedding::DOUBLE[], 1, 16))) AS pn
        |  FROM embeddings),
        |q AS (SELECT * FROM base WHERE vec_id % 100 = 0),
        |cand AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    round(list_dot_product(list_slice(q.v, 1, 16), list_slice(c.v, 1, 16))
        |      / (q.pn * c.pn), 6) AS approx_sim
        |  FROM base c CROSS JOIN q WHERE c.vec_id <> q.vec_id),
        |shortlist AS (
        |  SELECT query_id, neighbor_id FROM cand
        |  QUALIFY row_number() OVER (PARTITION BY query_id
        |    ORDER BY approx_sim DESC, neighbor_id) <= 20),
        |scored AS (
        |  SELECT s.query_id, s.neighbor_id,
        |    round(list_dot_product(qe.v, ce.v) / (qe.nrm * ce.nrm), 6) AS sim
        |  FROM shortlist s
        |  JOIN base qe ON qe.vec_id = s.query_id
        |  JOIN base ce ON ce.vec_id = s.neighbor_id)
        |SELECT query_id,
        |  row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS "rank",
        |  neighbor_id, sim
        |FROM scored
        |QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) <= 5
        |ORDER BY query_id, "rank"""".stripMargin,

    "q85_topk_ivf_exemplar" ->
      """WITH e AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v,
        |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        |  FROM embeddings),
        |c AS (SELECT vec_id AS cid, v AS cvec, nrm AS cnrm
        |      FROM e ORDER BY vec_id LIMIT 8),
        |assigned AS (
        |  SELECT e.vec_id AS neighbor_id, c.cid AS list
        |  FROM e CROSS JOIN c
        |  QUALIFY row_number() OVER (PARTITION BY e.vec_id
        |    ORDER BY round(list_dot_product(e.v, c.cvec) / (e.nrm * c.cnrm), 6) DESC,
        |             c.cid) = 1),
        |probes AS (
        |  SELECT e.vec_id AS query_id, c.cid AS list
        |  FROM e CROSS JOIN c
        |  WHERE e.vec_id % 100 = 0
        |  QUALIFY row_number() OVER (PARTITION BY e.vec_id
        |    ORDER BY round(list_dot_product(e.v, c.cvec) / (e.nrm * c.cnrm), 6) DESC,
        |             c.cid) <= 2),
        |scored AS (
        |  SELECT p.query_id, a.neighbor_id,
        |    round(list_dot_product(qe.v, ne.v) / (qe.nrm * ne.nrm), 6) AS sim
        |  FROM assigned a JOIN probes p USING (list)
        |  JOIN e qe ON qe.vec_id = p.query_id
        |  JOIN e ne ON ne.vec_id = a.neighbor_id
        |  WHERE a.neighbor_id <> p.query_id)
        |SELECT query_id,
        |  row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS "rank",
        |  neighbor_id, sim
        |FROM scored
        |QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) <= 5
        |ORDER BY query_id, "rank"""".stripMargin,

    // q85's candidate CTEs + q112's quantization, composed — the same
    // fragments that hash-check standalone verify the funnel jointly
    "q121_topk_ivf_int8" ->
      """WITH e AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v,
        |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm,
        |    list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) AS qmax,
        |    CASE WHEN list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) = 0
        |      THEN list_transform(embedding::DOUBLE[], x -> CAST(0 AS BIGINT))
        |      ELSE list_transform(embedding::DOUBLE[], x -> CAST(round(
        |        x * 127.0 / list_max(list_transform(embedding::DOUBLE[], y -> abs(y)))
        |      ) AS BIGINT)) END AS qvec
        |  FROM embeddings),
        |c AS (SELECT vec_id AS cid, v AS cvec, nrm AS cnrm
        |      FROM e ORDER BY vec_id LIMIT 8),
        |assigned AS (
        |  SELECT e.vec_id AS neighbor_id, c.cid AS list
        |  FROM e CROSS JOIN c
        |  QUALIFY row_number() OVER (PARTITION BY e.vec_id
        |    ORDER BY round(list_dot_product(e.v, c.cvec) / (e.nrm * c.cnrm), 6) DESC,
        |             c.cid) = 1),
        |probes AS (
        |  SELECT e.vec_id AS query_id, c.cid AS list
        |  FROM e CROSS JOIN c
        |  WHERE e.vec_id % 100 = 0
        |  QUALIFY row_number() OVER (PARTITION BY e.vec_id
        |    ORDER BY round(list_dot_product(e.v, c.cvec) / (e.nrm * c.cnrm), 6) DESC,
        |             c.cid) <= 2),
        |cand AS (
        |  SELECT p.query_id, a.neighbor_id,
        |    round((qe.qmax / 127.0) * (ne.qmax / 127.0) *
        |      list_dot_product(qe.qvec::DOUBLE[], ne.qvec::DOUBLE[]) /
        |      (qe.nrm * ne.nrm), 6) AS approx_sim
        |  FROM assigned a JOIN probes p USING (list)
        |  JOIN e qe ON qe.vec_id = p.query_id
        |  JOIN e ne ON ne.vec_id = a.neighbor_id
        |  WHERE a.neighbor_id <> p.query_id),
        |shortlist AS (
        |  SELECT query_id, neighbor_id FROM cand
        |  QUALIFY row_number() OVER (PARTITION BY query_id
        |    ORDER BY approx_sim DESC, neighbor_id) <= 20),
        |scored AS (
        |  SELECT s.query_id, s.neighbor_id,
        |    round(list_dot_product(qe.v, ne.v) / (qe.nrm * ne.nrm), 6) AS sim
        |  FROM shortlist s
        |  JOIN e qe ON qe.vec_id = s.query_id
        |  JOIN e ne ON ne.vec_id = s.neighbor_id)
        |SELECT query_id,
        |  row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS "rank",
        |  neighbor_id, sim
        |FROM scored
        |QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) <= 5
        |ORDER BY query_id, "rank"""".stripMargin,

    "q86_topk_lsh_portable" ->
      """WITH e AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v,
        |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        |  FROM embeddings),
        |pv AS (
        |  SELECT p.p, j.j,
        |    CASE WHEN strpos('89abcdef',
        |        substr(md5('graft:rhp:' || p.p || ':' || (j.j - 1)), 1, 1)) > 0
        |      THEN 1.0 ELSE -1.0 END AS val
        |  FROM generate_series(0, 3) AS p(p)
        |  CROSS JOIN generate_series(1, 64) AS j(j)),
        |planes AS (SELECT p, list(val ORDER BY j) AS pvec FROM pv GROUP BY p),
        |sigs AS (
        |  SELECT e.vec_id,
        |    string_agg(CASE WHEN list_dot_product(e.v, pl.pvec) >= 0
        |        THEN '1' ELSE '0' END, '' ORDER BY pl.p) AS sig
        |  FROM e CROSS JOIN planes pl GROUP BY e.vec_id),
        |cands AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id
        |  FROM sigs q JOIN sigs c USING (sig)
        |  WHERE q.vec_id % 100 = 0 AND c.vec_id <> q.vec_id),
        |scored AS (
        |  SELECT cands.query_id, cands.neighbor_id,
        |    round(list_dot_product(qe.v, ne.v) / (qe.nrm * ne.nrm), 6) AS sim
        |  FROM cands
        |  JOIN e qe ON qe.vec_id = cands.query_id
        |  JOIN e ne ON ne.vec_id = cands.neighbor_id)
        |SELECT query_id,
        |  row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS "rank",
        |  neighbor_id, sim
        |FROM scored
        |QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) <= 5
        |ORDER BY query_id, "rank"""".stripMargin,

    "q89_pq_adc_exemplar" ->
      """WITH e AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v,
        |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        |  FROM embeddings),
        |u AS (
        |  SELECT vec_id, v, nrm,
        |    list_transform(v, x -> x / (CASE WHEN nrm > 0 THEN nrm ELSE 1 END)) AS uv
        |  FROM e),
        |cw AS (
        |  SELECT s.s, t.vec_id AS cwid, t.uv[s.s * 8 + 1 : s.s * 8 + 8] AS cwv
        |  FROM (SELECT vec_id, uv FROM u ORDER BY vec_id LIMIT 16) t
        |  CROSS JOIN generate_series(0, 7) AS s(s)),
        |enc AS (
        |  SELECT vec_id AS neighbor_id, s, cwid FROM (
        |    SELECT n.vec_id, c.s, c.cwid,
        |      row_number() OVER (PARTITION BY n.vec_id, c.s
        |        ORDER BY round(list_distance(n.uv[c.s * 8 + 1 : c.s * 8 + 8], c.cwv), 6),
        |                 c.cwid) AS rn
        |    FROM u n CROSS JOIN cw c) WHERE rn = 1),
        |qlut AS (
        |  SELECT q.vec_id AS query_id, c.s, c.cwid,
        |    round(list_distance(q.uv[c.s * 8 + 1 : c.s * 8 + 8], c.cwv), 6) AS d
        |  FROM u q CROSS JOIN cw c
        |  WHERE q.vec_id % 100 = 0),
        |adc AS (
        |  SELECT l.query_id, enc.neighbor_id, round(sum(l.d), 6) AS approx
        |  FROM enc JOIN qlut l USING (s, cwid)
        |  WHERE enc.neighbor_id <> l.query_id
        |  GROUP BY 1, 2),
        |shortlist AS (
        |  SELECT query_id, neighbor_id FROM adc
        |  QUALIFY row_number() OVER (PARTITION BY query_id
        |    ORDER BY approx, neighbor_id) <= 15),
        |scored AS (
        |  SELECT sl.query_id, sl.neighbor_id,
        |    round(list_dot_product(qe.v, ne.v) / (qe.nrm * ne.nrm), 6) AS sim
        |  FROM shortlist sl
        |  JOIN e qe ON qe.vec_id = sl.query_id
        |  JOIN e ne ON ne.vec_id = sl.neighbor_id)
        |SELECT query_id,
        |  row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS "rank",
        |  neighbor_id, sim
        |FROM scored
        |QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) <= 5
        |ORDER BY query_id, "rank"""".stripMargin,

    "q87_lloyd_step_exemplar" ->
      """WITH e AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v,
        |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        |  FROM embeddings),
        |c AS (SELECT vec_id AS cid, v AS cvec, nrm AS cnrm
        |      FROM e ORDER BY vec_id LIMIT 8),
        |assigned AS (
        |  SELECT c.cid AS list, e.v, e.nrm
        |  FROM e CROSS JOIN c
        |  QUALIFY row_number() OVER (PARTITION BY e.vec_id
        |    ORDER BY round(list_dot_product(e.v, c.cvec) / (e.nrm * c.cnrm), 6) DESC,
        |             c.cid) = 1),
        |comp AS (
        |  SELECT a.list, gs.pos - 1 AS pos,
        |    a.v[gs.pos] / (CASE WHEN a.nrm > 0 THEN a.nrm ELSE 1 END) AS ux
        |  FROM assigned a CROSS JOIN generate_series(1, 64) AS gs(pos)),
        |means AS (
        |  SELECT list, pos,
        |    CAST(sum(CAST(ux AS DECIMAL(30,12))) AS DOUBLE) / count(*) AS m
        |  FROM comp GROUP BY 1, 2),
        |norms AS (
        |  SELECT list, sqrt(CAST(sum(CAST(m * m AS DECIMAL(30,12))) AS DOUBLE)) AS mn
        |  FROM means GROUP BY 1)
        |SELECT m.list, m.pos, floor(m.m / n.mn * 1e6) / 1e6 AS "value"
        |FROM means m JOIN norms n USING (list)
        |ORDER BY list, pos""".stripMargin,

    "q91_lloyd_iterate_exemplar" ->
      """WITH e AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v,
        |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        |  FROM embeddings),
        |c0 AS (SELECT vec_id AS cid, v AS cvec, nrm AS cnrm
        |       FROM e ORDER BY vec_id LIMIT 8),
        |assigned0 AS (
        |  SELECT c.cid AS list, e.v, e.nrm
        |  FROM e CROSS JOIN c0 c
        |  QUALIFY row_number() OVER (PARTITION BY e.vec_id
        |    ORDER BY round(list_dot_product(e.v, c.cvec) / (e.nrm * c.cnrm), 6) DESC,
        |             c.cid) = 1),
        |comp0 AS (
        |  SELECT a.list, gs.pos - 1 AS pos,
        |    a.v[gs.pos] / (CASE WHEN a.nrm > 0 THEN a.nrm ELSE 1 END) AS ux
        |  FROM assigned0 a CROSS JOIN generate_series(1, 64) AS gs(pos)),
        |means0 AS (
        |  SELECT list, pos,
        |    CAST(sum(CAST(ux AS DECIMAL(30,12))) AS DOUBLE) / count(*) AS m
        |  FROM comp0 GROUP BY 1, 2),
        |norms0 AS (
        |  SELECT list, sqrt(CAST(sum(CAST(m * m AS DECIMAL(30,12))) AS DOUBLE)) AS mn
        |  FROM means0 GROUP BY 1),
        |vals0 AS (
        |  SELECT m.list, m.pos, m.m / n.mn AS value
        |  FROM means0 m JOIN norms0 n USING (list)),
        |c1 AS (
        |  SELECT list AS cid, list(value ORDER BY pos) AS cvec
        |  FROM vals0 GROUP BY list),
        |c1n AS (SELECT cid, cvec, sqrt(list_dot_product(cvec, cvec)) AS cnrm
        |        FROM c1),
        |assigned1 AS (
        |  SELECT c.cid AS list, e.v, e.nrm
        |  FROM e CROSS JOIN c1n c
        |  QUALIFY row_number() OVER (PARTITION BY e.vec_id
        |    ORDER BY round(list_dot_product(e.v, c.cvec) / (e.nrm * c.cnrm), 6) DESC,
        |             c.cid) = 1),
        |comp1 AS (
        |  SELECT a.list, gs.pos - 1 AS pos,
        |    a.v[gs.pos] / (CASE WHEN a.nrm > 0 THEN a.nrm ELSE 1 END) AS ux
        |  FROM assigned1 a CROSS JOIN generate_series(1, 64) AS gs(pos)),
        |means1 AS (
        |  SELECT list, pos,
        |    CAST(sum(CAST(ux AS DECIMAL(30,12))) AS DOUBLE) / count(*) AS m
        |  FROM comp1 GROUP BY 1, 2),
        |norms1 AS (
        |  SELECT list, sqrt(CAST(sum(CAST(m * m AS DECIMAL(30,12))) AS DOUBLE)) AS mn
        |  FROM means1 GROUP BY 1)
        |SELECT m.list, m.pos, floor(m.m / n.mn * 1e6) / 1e6 AS "value"
        |FROM means1 m JOIN norms1 n USING (list)
        |ORDER BY list, pos""".stripMargin,
  )
}
