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
}
