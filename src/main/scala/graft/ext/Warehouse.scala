package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Managed-table hygiene for artifact writers that OVERWRITE into the
  * session warehouse (`Graph.writePageRank`, `RobotsCache.rebuild`):
  * with the in-memory catalog, a managed table written in a PREVIOUS
  * session leaves its directory behind but not its catalog entry, and
  * `saveAsTable(overwrite)` then dies with LOCATION_ALREADY_EXISTS —
  * the table is new to this session's catalog, so overwrite never
  * fires. Rebuilds must drop both the entry and any orphaned
  * directory first.
  */
object Warehouse {

  /** Drop `table` from the catalog if present AND delete its
    * would-be managed location if a prior session left one behind.
    * Safe on tables that never existed. */
  def resetTable(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(ident))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
  }

  /** Overwrite `table` with `df` THROUGH a stage table — the
    * maintenance-rewrite discipline (`IndexAudit.repairIvfAssignments`'
    * pattern) for rewrites whose input is the target table itself:
    * Spark refuses an in-place overwrite of its own input, and the
    * naive escape (`localCheckpoint` the new contents, then overwrite)
    * pins the ENTIRE new state in executor block storage for the
    * duration — at corpus scale that holds the whole table in memory
    * and dies with any executor. Staging writes the new contents to
    * `<table>__compact` (same bucket/sort layout, so downstream
    * Exchange-free plans survive), re-reads the STAGE (durable
    * parquet, executor-loss-safe) to overwrite the target, and drops
    * the stage. Data writes twice; nothing corpus-sized is ever held
    * in memory. */
  def stagedOverwrite(spark: SparkSession, table: String, df: DataFrame,
                      nBuckets: Int, bucketCols: Seq[String],
                      sortCols: Seq[String]): Unit = {
    require(bucketCols.nonEmpty, s"stagedOverwrite($table): no bucket cols")
    val stage = s"${table}__compact"
    resetTable(spark, stage)
    def write(src: DataFrame, target: String): Unit = {
      val w = src.write.format("parquet")
        .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
      (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*)
       else w).mode("overwrite").saveAsTable(target)
    }
    write(df, stage)
    write(spark.table(stage), table)
    spark.sql(s"DROP TABLE $stage")
  }
}
