package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Size-targeted compacting writer — the operational answer to the two
  * storage pathologies a 100 TB corpus develops: the SMALL-FILES problem
  * (a 1000-executor streaming ingest happily writes millions of KB-sized
  * files, after which every scan pays per-file open/footer costs and the
  * driver pays per-file listing memory) and RANDOM ROW ORDER (min/max
  * footer stats span the whole key range in every file, so predicate
  * pushdown prunes nothing).
  *
  * `repartitionByRange + sortWithinPartitions` fixes both in one shuffle:
  * the output has a bounded file count sized to `targetFileBytes`, and
  * each file covers a disjoint sort-key range — a later
  * `WHERE key BETWEEN …` scan reads only the files whose footer range
  * intersects (data skipping), the same layout idea as Z-ordering for a
  * single-key sort order.
  */
object Compact {

  /** Number of target files for `totalBytes` of data: at least one file,
    * never more than one file per `targetFileBytes` (last file may be
    * smaller).
    */
  def fileCountFor(totalBytes: Long, targetFileBytes: Long): Int = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    math.max(1L, (totalBytes + targetFileBytes - 1) / targetFileBytes)
      .min(Int.MaxValue).toInt
  }

  /** Compact a DataFrame to `outPath` with ~`targetFileBytes` files,
    * range-laid-out on `sortCols`. Sizing uses Catalyst's logical size
    * estimate scaled by `encodedRatio`. The default ratio is 1.0 because
    * for the common input — a parquet/ORC scan — the plan statistic IS
    * the encoded on-disk size already (`fileCompressionFactor` defaults
    * to 1.0), so any further discount undersizes the file count. Pass a
    * measured ratio (e.g. ~0.25) only for frames whose stats are
    * in-memory row estimates (ranges, joins of in-memory data, caches).
    * For an existing directory prefer [[compactDir]], which sizes from
    * real bytes.
    *
    * Returns the file count chosen. `format` is any DataSource format
    * with footer statistics — parquet (default) or orc.
    */
  def compactToSize(df: DataFrame, sortCols: Seq[String], outPath: String,
                    targetFileBytes: Long = 128L << 20,
                    format: String = "parquet",
                    encodedRatio: Double = 1.0): Int = {
    require(sortCols.nonEmpty, "sortCols must be non-empty")
    val estBytes = (df.queryExecution.optimizedPlan.stats.sizeInBytes
      .toDouble * encodedRatio).toLong
    val nFiles = fileCountFor(estBytes, targetFileBytes)
    val keys: Seq[Column] = sortCols.map(col)
    df.repartitionByRange(nFiles, keys: _*)
      .sortWithinPartitions(keys: _*)
      .write.mode("overwrite").format(format).save(outPath)
    nFiles
  }

  /** Compact an EXISTING directory of files using its real on-disk byte
    * size (no estimate needed — this is the maintenance-job entry point
    * that fixes a small-files-ridden table in place-adjacent storage).
    */
  def compactDir(spark: SparkSession, inPath: String, sortCols: Seq[String],
                 outPath: String, targetFileBytes: Long = 128L << 20,
                 format: String = "parquet"): Int = {
    require(sortCols.nonEmpty, "sortCols must be non-empty")
    val hPath = new Path(inPath)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.getContentSummary(hPath).getLength
    val nFiles = fileCountFor(totalBytes, targetFileBytes)
    val keys: Seq[Column] = sortCols.map(col)
    spark.read.format(format).load(inPath)
      .repartitionByRange(nFiles, keys: _*)
      .sortWithinPartitions(keys: _*)
      .write.mode("overwrite").format(format).save(outPath)
    nFiles
  }
}
