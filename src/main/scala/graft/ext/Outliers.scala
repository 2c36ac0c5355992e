package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Per-group statistical outlier detection — the numeric data-quality
  * rule the reference's negative-value check (SURVEY §2 F5,
  * data_quality_checker.py:330-347) generalizes to: instead of a fixed
  * `< 0` predicate, flag values far from their GROUP's distribution.
  *
  * Scale design: one aggregation computes each group's count and the
  * DECIMAL-exact Σx / Σx² (order-independent, so mean/stddev are
  * bit-deterministic across partitionings — a plain double sum through a
  * shuffle is not), the tiny per-group stats broadcast-join back onto
  * the fact table, and the z-score filter is a codegen'd projection.
  * Two passes over the data, zero wide shuffles of the fact rows.
  */
object Outliers {

  private val dec = DecimalType(30, 10)

  /** Rows whose `valueCol` sits more than `threshold` sample standard
    * deviations from their `groupCol` mean, with the z-score (rounded to
    * 4 decimals) appended. Groups with fewer than 2 rows or zero
    * variance produce no outliers (their std is 0/undefined, not
    * infinite evidence).
    */
  def zscoreOutliers(df: DataFrame, groupCol: String, valueCol: String,
                     threshold: Double): DataFrame = {
    val v = col(valueCol)
    val stats = df.groupBy(col(groupCol)).agg(
      count(v).as("__n"),
      sum(v.cast(dec)).cast("double").as("__s"),
      sum((v * v).cast(dec)).cast("double").as("__s2"))
    val mean = col("__s") / col("__n")
    val variance = (col("__s2") - col("__s") * col("__s") / col("__n")) /
      (col("__n") - 1)
    df.join(broadcast(stats), groupCol)
      .filter(col("__n") > 1 && variance > 0)
      .withColumn("z", round((v - mean) / sqrt(variance), 4))
      .filter(abs(col("z")) > threshold)
      .drop("__n", "__s", "__s2")
  }

  /** PREQUENTIAL variant — each row z-scored against the running moments
    * of the rows BEFORE it (per group, in `orderCols` order) via an
    * unbounded-preceding window frame: the batch twin of
    * [[graft.streaming.AnomalyDetect]]'s stateful fold (spec-pinned
    * equal), and the retrospective form of what the stream computes
    * online. Running sums go through DECIMAL so the result is
    * independent of the engine's frame-aggregation order. Rows within
    * the first `minPrior` observations of their group never flag.
    *
    * Scale note: an unbounded-preceding frame serializes each group
    * through one task — fine for a bounded group population (metric
    * names, event types), wrong for a group that alone exceeds a task.
    * At that size, switch to epoch-seeded scoring (per-epoch base
    * moments from [[zscoreOutliers]]'s aggregate, prequential only
    * within the epoch) or to the streaming fold, which carries the
    * moments in O(1) state instead of a frame.
    */
  def prequentialOutliers(df: DataFrame, groupCol: String,
                          orderCols: Seq[String], valueCol: String,
                          threshold: Double, minPrior: Int): DataFrame = {
    val v = col(valueCol)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val n = count(lit(1)).over(w)
    val sm = sum(v.cast(dec)).over(w).cast("double")
    val s2 = sum((v * v).cast(dec)).over(w).cast("double")
    val mean = sm / n
    val variance = (s2 - sm * sm / n) / (n - 1)
    df.select(df.columns.map(col) :+ n.as("n_prior") :+
        variance.as("__var") :+
        round((v - mean) / sqrt(variance), 4).as("z"): _*)
      .filter(col("n_prior") >= minPrior && col("__var") > 0 &&
        abs(col("z")) > threshold)
      .drop("__var")
  }
}
