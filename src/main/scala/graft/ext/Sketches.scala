package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketches over corpus shards, on Spark's
  * native Apache DataSketches HLL functions (`hll_sketch_agg` /
  * `hll_union_agg` / `hll_sketch_estimate` — codegen'd aggregates, no
  * UDFs).
  *
  * The 100 TB pattern this enables: build ONE tiny sketch relation per
  * ingest (a few KB per shard, regardless of shard size), persist it,
  * and answer "how many distinct documents / urls / fingerprints across
  * any subset of shards" by merging sketches — never re-scanning the
  * corpus. Sketch union is lossless for HLL (union-of-sketches ≡
  * sketch-of-union, spec-pinned), so incremental ingest composes: each
  * new batch appends its shard sketches and the union stays exact w.r.t.
  * what a one-shot sketch of everything would say.
  *
  * Estimates are approximate (±~1.6% at the default lgK=12) but
  * DETERMINISTIC — DataSketches HLL is seedless-hash-based, so the same
  * input always yields the same estimate, which is what lets q113 gate
  * the estimate with an exact-count tolerance check (the q40 pattern).
  */
object Sketches {

  /** Default log2 of the HLL register count: 2^12 registers ≈ 1.6%
    * relative standard error, 4 KB per sketch.
    */
  val DefaultLgK = 12

  /** One HLL sketch per shard over `keyCol`: the persistable distinct
    * index. A single hash-partitioned aggregation — map-side partials
    * mean each input partition contributes one sketch per local shard
    * before the (tiny) shuffle.
    */
  def distinctSketches(df: DataFrame, keyCol: String, shardCol: String,
                       lgK: Int = DefaultLgK): DataFrame =
    df.groupBy(col(shardCol).as("shard"))
      .agg(hll_sketch_agg(col(keyCol), lit(lgK)).as("sketch"),
        count(lit(1)).as("n_rows"))

  /** Persist the shard-sketch relation (parquet: shard, sketch binary,
    * n_rows). The index is O(shards), not O(rows) — re-writing it per
    * ingest batch is negligible next to the scan that produced it.
    */
  def writeDistinctSketches(df: DataFrame, keyCol: String, shardCol: String,
                            path: String, lgK: Int = DefaultLgK): Unit =
    distinctSketches(df, keyCol, shardCol, lgK)
      .write.mode("overwrite").parquet(path)

  def readSketches(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Per-shard distinct estimates from a sketch relation — no corpus
    * access. Merge-aware: an index that accumulated multiple rows per
    * shard (one per ingest batch — [[appendDistinctSketches]], the
    * streaming loop) unions them per shard first; union is lossless, so
    * batch-accumulated and one-shot indexes answer identically
    * (spec-pinned).
    */
  def estimatePerShard(sketches: DataFrame): DataFrame =
    sketches.groupBy(col("shard"))
      .agg(sum(col("n_rows")).as("n_rows"),
        hll_sketch_estimate(hll_union_agg(col("sketch"), lit(false)))
          .as("est_distinct"))

  /** Append one ingest batch's shard sketches to a persisted index: the
    * incremental path — each batch is scanned once, the index grows by
    * O(shards) KB-rows, and readers union per shard at answer time.
    */
  def appendDistinctSketches(df: DataFrame, keyCol: String, shardCol: String,
                             path: String, lgK: Int = DefaultLgK): Unit =
    distinctSketches(df, keyCol, shardCol, lgK)
      .write.mode("append").parquet(path)

  /** Distinct estimate across ALL shards (or any filtered subset the
    * caller passes): merge the sketches, estimate once. The merge is the
    * whole point — exact distinct across shards would need the raw keys
    * again; the union needs only the KB-sized sketches.
    */
  def estimateUnion(sketches: DataFrame): DataFrame =
    sketches.agg(
      hll_sketch_estimate(hll_union_agg(col("sketch"), lit(false)))
        .as("est_distinct"),
      sum(col("n_rows")).as("n_rows"))

  /** Distinct-overlap estimate between two sketch relations by
    * inclusion–exclusion: |A∩B| ≈ est(A) + est(B) − est(A∪B), every
    * term from sketch merges — no corpus access, no join. The
    * cross-corpus decontamination census at 100 TB: "how many training
    * fingerprints also appear in the benchmark corpus" answered from two
    * KB-sized persisted indexes. One row: est_a, est_b, est_union,
    * est_overlap (clamped at 0 — inclusion–exclusion can go slightly
    * negative for disjoint sets at sketch error).
    *
    * Error note: the absolute error is driven by the UNION's cardinality
    * (~1.6%·|A∪B| at lgK 12), so small overlaps between huge corpora
    * need a bigger lgK or the exact Bloom/join path
    * ([[Dedup.contaminationHitsBloom]]) — this is the census shape, the
    * per-document verdict stays with the exact operators.
    */
  def overlapEstimate(sketchesA: DataFrame, sketchesB: DataFrame): DataFrame = {
    val a = sketchesA.agg(
      hll_sketch_estimate(hll_union_agg(col("sketch"), lit(false))).as("est_a"),
      hll_union_agg(col("sketch"), lit(false)).as("ska"))
    val b = sketchesB.agg(
      hll_sketch_estimate(hll_union_agg(col("sketch"), lit(false))).as("est_b"),
      hll_union_agg(col("sketch"), lit(false)).as("skb"))
    a.crossJoin(b)
      .select(col("est_a"), col("est_b"),
        hll_sketch_estimate(hll_union(col("ska"), col("skb"),
            allowDifferentLgConfigK = false))
          .as("est_union"))
      .select(col("est_a"), col("est_b"), col("est_union"),
        greatest(col("est_a") + col("est_b") - col("est_union"), lit(0L))
          .as("est_overlap"))
  }

  // --------------------------------------------------------------------
  // Count-min: the FREQUENCY twin of the HLL distinct index. Same shard
  // shape (one KB-sized binary per shard, persistable, mergeable), but
  // the merge is EXACT — CMS cells are counters, merging adds them, so
  // merged-shard estimates equal one-shot estimates bit for bit (unlike
  // HLL, where losslessness holds for the estimate, spec-pinned both).
  // Estimates are one-sided: est >= exact always, and
  // est <= exact + eps·N with confidence `conf` per probe.
  // --------------------------------------------------------------------

  /** One count-min sketch per shard over `keyCol` (Spark's native
    * `count_min_sketch` aggregate — map-side partial merges, tiny
    * shuffle). `eps` bounds overshoot (≤ eps·N at confidence `conf`);
    * `seed` fixes the hash family so estimates are deterministic.
    */
  def cmsSketches(df: DataFrame, keyCol: String, shardCol: String,
                  eps: Double = 0.001, conf: Double = 0.999,
                  seed: Int = 42): DataFrame =
    df.groupBy(col(shardCol).as("shard"))
      .agg(count_min_sketch(col(keyCol), lit(eps), lit(conf), lit(seed))
        .as("sketch"),
        count(lit(1)).as("n_rows"))

  def writeCmsSketches(df: DataFrame, keyCol: String, shardCol: String,
                       path: String, eps: Double = 0.001,
                       conf: Double = 0.999, seed: Int = 42): Unit =
    cmsSketches(df, keyCol, shardCol, eps, conf, seed)
      .write.mode("overwrite").parquet(path)

  /** Append one ingest batch's CMS shard sketches to a persisted index
    * — the incremental twin of [[appendDistinctSketches]]. Accumulated
    * rows merge exactly (counter addition), so [[cmsCollectMerged]]
    * over the grown index equals the one-shot sketch of everything
    * ingested, bit for bit.
    */
  def appendCmsSketches(df: DataFrame, keyCol: String, shardCol: String,
                        path: String, eps: Double = 0.001,
                        conf: Double = 0.999, seed: Int = 42): Unit =
    cmsSketches(df, keyCol, shardCol, eps, conf, seed)
      .write.mode("append").parquet(path)

  /** Merge shard CMS binaries into one sketch, driver-side. Bounded
    * driver state by construction — O(shards) sketches of a few KB each
    * (the same k×dim-style bound as IVF's centroid collect), never keys
    * or rows. Counter addition, so the result is EXACTLY the sketch a
    * one-shot aggregation over the union would build.
    */
  def cmsMerge(sketchBinaries: Seq[Array[Byte]]): Array[Byte] = {
    require(sketchBinaries.nonEmpty, "no sketches to merge")
    import org.apache.spark.util.sketch.CountMinSketch
    val merged = sketchBinaries.map(b =>
      CountMinSketch.readFrom(new java.io.ByteArrayInputStream(b)))
      .reduce { (a, b) => a.mergeInPlace(b); a }
    merged.toByteArray
  }

  /** Collect a shard-sketch relation (or any filtered subset) into one
    * merged binary: the probe-side artifact.
    */
  def cmsCollectMerged(sketches: DataFrame): Array[Byte] =
    cmsMerge(sketches.select(col("sketch"))
      .collect().map(_.getAs[Array[Byte]](0)).toSeq)

  /** Frequency estimate of `keyExpr` against a merged sketch: a pure
    * codegen'd projection (`CmsEstimateExpr` — the lookup side Spark's
    * own CMS aggregate doesn't ship). Requires
    * `GraftFunctions.register(spark)`. The probe relation never touches
    * the corpus the sketch was built from.
    */
  def cmsEstimate(keyExpr: org.apache.spark.sql.Column,
                  merged: Array[Byte]): org.apache.spark.sql.Column =
    call_function("graft_cms_estimate", keyExpr, lit(merged))
}
