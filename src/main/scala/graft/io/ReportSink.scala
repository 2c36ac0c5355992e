package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Violations report sink (S10, data_quality_checker.py:63-72).
  *
  * The reference appends one CSV per (table, issue) under
  * `data_quality_errors/`, writing the header only on first creation.
  * Here the single violations relation is written partitioned by
  * (table, rule) — same browsable per-issue layout on disk, but produced
  * by one distributed write instead of a driver-side append loop, and
  * re-loadable as one partitioned table for audit queries (S11's
  * queryable-audit-trail requirement).
  */
object ReportSink {

  def writeViolations(violations: DataFrame, dir: String,
                      mode: SaveMode = SaveMode.Append): Unit =
    violations
      // partition columns vanish from the file payload; keep a copy so
      // each CSV row remains self-describing like the reference's files
      .withColumn("table_name", col("table"))
      .withColumn("rule_name", col("rule"))
      .write
      .partitionBy("table_name", "rule_name")
      .option("header", "true")
      .mode(mode)
      .csv(dir)

  /** Load a previously-written report back as one queryable frame. */
  def readViolations(spark: org.apache.spark.sql.SparkSession,
                     dir: String): DataFrame =
    spark.read.option("header", "true").csv(dir)
}
