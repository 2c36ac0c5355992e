package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot-key joins and aggregations.
  *
  * AQE's skew-join handling (on by default) splits oversized partitions
  * for sort-merge joins, but it cannot fix a skewed *broadcast-side probe*
  * or a skewed aggregation key. These helpers implement the classic
  * salting patterns for those cases — the tools a 100 TB run reaches for
  * when one user/key holds 1% of all rows.
  */
object Skew {

  /** Two-stage (partial → final) aggregation with a random salt:
    * stage 1 groups by (keys, salt) — spreading a hot key over
    * `saltBuckets` reducers — stage 2 folds the partials. Use for
    * algebraic aggregates (sum/count/min/max) when one key dominates.
    *
    * `aggs` maps output column name → (partialAgg, finalAgg) builders.
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], saltBuckets: Int,
                aggs: Map[String, (Column => Column, Column => Column)])
      : DataFrame = {
    val salted = df.withColumn("__salt",
      (rand(42) * saltBuckets).cast("int"))
    val partialCols = aggs.map { case (name, (partial, _)) =>
      partial(col(name)).as(s"__p_$name")
    }.toSeq
    val partial = salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(partialCols.head, partialCols.tail: _*)
    val finalCols = aggs.map { case (name, (_, fin)) =>
      fin(col(s"__p_$name")).as(name)
    }.toSeq
    partial.groupBy(keys.map(col): _*)
      .agg(finalCols.head, finalCols.tail: _*)
  }

  /** Salted equi-join for a skewed LEFT side against a small-ish right
    * side: left rows get a random salt in [0, saltBuckets); the right side
    * is replicated once per salt value; the join key becomes
    * (keys, salt). A hot left key now lands on `saltBuckets` partitions
    * instead of one. Right-side replication costs |right| × saltBuckets —
    * use only when that product stays comfortably in memory/shuffle
    * budget (the usual fact-to-dimension skew shape).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 saltBuckets: Int, joinType: String = "inner"): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      (rand(42) * saltBuckets).cast("int"))
    val replicatedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedLeft.join(replicatedRight, keys :+ "__salt", joinType)
      .drop("__salt")
  }

  /** Rows-per-key profile — the diagnostic that decides whether salting is
    * needed: top `n` heaviest keys with their share of total rows.
    */
  def keySkewProfile(df: DataFrame, keys: Seq[String], n: Int = 20): DataFrame = {
    val total = df.count()
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("rows"))
      .withColumn("share", round(col("rows") / total, 6))
      .orderBy(col("rows").desc)
      .limit(n)
  }
}
