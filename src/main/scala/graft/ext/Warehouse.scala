package graft.ext

import org.apache.spark.sql.SparkSession

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
}
