package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 3NF normalization helpers, generalizing the reference's geolocation
  * split (`split_and_save_geolocation`, etl2.py:204-243): build a distinct
  * dimension with a dense surrogate key, then attach the key back to the
  * fact via broadcast join (the reference uses a driver-side dict lookup,
  * etl2.py:213-217 — same semantics, but a join distributes).
  */
object Normalize {

  /** Distinct `cols` + dense 1-based surrogate `idCol`, deterministically
    * ordered by `cols` (W1; the reference numbers rows by pandas index
    * order, etl2.py:208-211 — we pin the order explicitly instead).
    *
    * Scale note: `row_number` over a global ORDER BY funnels through one
    * partition, which is fine for dimensions (distinct city/state pairs
    * are small by construction) but must never be applied to facts. For
    * dimensions that outgrow one task, [[dimensionWithSurrogateScalable]]
    * assigns the SAME ids without the funnel; for a fact-sized surrogate
    * where density (not order) is the contract, use
    * `monotonically_increasing_id`-style ids instead.
    */
  def dimensionWithSurrogate(df: DataFrame, cols: Seq[String],
                             idCol: String): DataFrame = {
    val w = Window.orderBy(cols.map(col): _*)
    df.select(cols.map(col): _*).distinct()
      .withColumn(idCol, row_number().over(w))
      .select((idCol +: cols).map(col): _*)
  }

  /** [[dimensionWithSurrogate]] without the single-partition funnel: the
    * same dense 1-based ids in the same global `cols` order, assigned in
    * TWO phases — range-repartition the distinct dimension on `cols`
    * (ranges are ordered by partition id), count rows per partition (a
    * `partitions`-row driver aggregate, not data), then
    * `id = offset(partition) + row_number within partition`. Every
    * window is per-partition, so no stage ever funnels through one task.
    *
    * Spec-pinned equal to the window version (NormalizeSpec). Use this
    * for dimensions too large to sort on one task — i.e. when W1's
    * documented "dimensions are small" assumption stops holding.
    * Distinct keys make range boundaries unambiguous (no duplicate key
    * can straddle a boundary), so the two-phase ids are exactly the
    * global rank.
    *
    * The two phases MUST observe the same range partitioning:
    * `RangePartitioner` samples with a seed derived from the RDD id, so
    * re-executing the plan for the second job could draw different range
    * bounds, silently mis-joining the offsets map (stale `__pid`s →
    * duplicate or null ids). We therefore materialize the partitioned
    * frame exactly once with an eager `localCheckpoint`: both the counts
    * job and the id-assignment job read the same immutable partitions,
    * and lineage is truncated so nothing can ever re-sample. (Trade-off:
    * losing an executor fails the job loudly instead of recomputing —
    * recomputation is exactly what must not happen here.)
    */
  def dimensionWithSurrogateScalable(df: DataFrame, cols: Seq[String],
                                     idCol: String,
                                     partitions: Int = 32): DataFrame = {
    val withPid = df.select(cols.map(col): _*).distinct()
      .repartitionByRange(partitions, cols.map(col): _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    // tiny driver state: one (pid, count) row per partition
    val counts: Map[Int, Long] = withPid.groupBy("__pid").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val pids = counts.keys.toSeq.sorted
    val offsets: Map[Int, Long] = pids
      .zip(pids.scanLeft(0L)((acc, p) => acc + counts(p)).init).toMap
    val offsetExpr = typedlit(offsets)
    val w = Window.partitionBy("__pid").orderBy(cols.map(col): _*)
    withPid
      .withColumn(idCol,
        (element_at(offsetExpr, col("__pid")) +
          row_number().over(w)).cast("int"))
      .select((idCol +: cols).map(col): _*)
  }

  /** Attach a dimension's surrogate key to the fact on `cols` (J5). The
    * dimension side is explicitly broadcast: it is distinct-small by
    * construction, so no shuffle of the fact is ever needed.
    */
  def attachSurrogate(fact: DataFrame, dim: DataFrame,
                      cols: Seq[String], idCol: String): DataFrame =
    fact.join(broadcast(dim), cols, "left")

  /** The reference's geolocation → 3NF split (etl2.py:204-243):
    * (city dimension w/ surrogate, zip→city map, zip→coordinates).
    * Column names follow the reference's renames (etl2.py:209,222,228-232).
    */
  def splitGeolocation(geo: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val renamed = geo
      .withColumnRenamed("geolocation_city", "city")
      .withColumnRenamed("geolocation_state", "state")
      .withColumnRenamed("geolocation_zip_code_prefix", "zip_code")
      .withColumnRenamed("geolocation_lat", "latitude")
      .withColumnRenamed("geolocation_lng", "longitude")

    val cityState = dimensionWithSurrogate(renamed, Seq("city", "state"), "city_id")

    val zip = attachSurrogate(
        renamed.dropDuplicates("zip_code"), cityState,
        Seq("city", "state"), "city_id")
      .select("zip_code", "city_id")

    val coords = renamed.select("zip_code", "longitude", "latitude").distinct()
    (cityState, zip, coords)
  }
}
