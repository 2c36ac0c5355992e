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

  /** Per-shard distinct estimates from a sketch relation: a pure
    * projection — no corpus access.
    */
  def estimatePerShard(sketches: DataFrame): DataFrame =
    sketches.select(col("shard"), col("n_rows"),
      hll_sketch_estimate(col("sketch")).as("est_distinct"))

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
}
