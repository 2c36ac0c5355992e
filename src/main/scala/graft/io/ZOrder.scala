package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) layout: multi-column data skipping where
  * [[Compact]]'s single-key range sort cannot help.
  *
  * A range sort on `x` gives perfect file pruning for `x` predicates and
  * NONE for `y` predicates — every file's `y` min/max spans the whole
  * domain. Interleaving the bits of the columns' normalized bins and
  * range-partitioning on that Morton value gives every clustered column
  * partial locality: each file covers a small rectangle of the (x, y)
  * space, so footer min/max stats prune files for predicates on ANY
  * clustered column (the Delta/Iceberg OPTIMIZE ZORDER idea, from
  * Morton 1966).
  *
  * Normalization is linear min/max binning to `bits`-bit ranks computed
  * from one tiny driver-side aggregate. Heavily skewed columns should be
  * pre-transformed (log, rank) before clustering — the same caveat the
  * production implementations carry.
  */
object ZOrder {

  /** Morton value of pre-binned coordinates: `binned` columns must each
    * be a long in `[0, 2^bits)`; bit `b` of column `i` lands at position
    * `b * n + i` of the interleaved value. `bits * binned.size` must fit
    * in a long's 63 value bits. The expansion is a flat
    * shift/and/or tree — whole-stage-codegen'd, no UDF, no allocation.
    */
  def interleave(binned: Seq[Column], bits: Int): Column = {
    require(binned.nonEmpty, "need at least one column")
    require(bits > 0 && bits * binned.size <= 63,
      s"bits=$bits x ${binned.size} cols must stay within 63 bits")
    val n = binned.size
    val terms = for {
      b <- 0 until bits
      (c, i) <- binned.zipWithIndex
    } yield shiftleft(shiftright(c, b).bitwiseAND(lit(1L)), b * n + i)
    terms.reduce(_ bitwiseOR _)
  }

  /** Linear min/max bin of `c` into `[0, 2^bits)` as a long. Constant
    * columns (min == max) bin to 0.
    */
  def bin(c: Column, minV: Double, maxV: Double, bits: Int): Column = {
    val buckets = (1L << bits) - 1
    if (maxV > minV)
      floor((c.cast("double") - minV) / (maxV - minV) * buckets).cast("long")
    else lit(0L)
  }

  /** Append a `__z` Morton column over `cols` (numeric/date/timestamp —
    * anything castable to double), binning each to `bits` bits using the
    * frame's own min/max (ONE scalar aggregate row to the driver — the
    * same bounded result a broadcast would carry).
    */
  def withZValue(df: DataFrame, cols: Seq[String], bits: Int = 8)
      : DataFrame = {
    val aggs = cols.flatMap(c => Seq(
      min(col(c).cast("double")).as(s"__min_$c"),
      max(col(c).cast("double")).as(s"__max_$c")))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val binned = cols.zipWithIndex.map { case (c, i) =>
      bin(col(c), row.getDouble(2 * i), row.getDouble(2 * i + 1), bits)
    }
    df.withColumn("__z", interleave(binned, bits))
  }

  /** Write `df` to `outPath` in `nFiles` files clustered on the Morton
    * curve over `cols`: range-partition + in-partition sort on `__z`, so
    * every file covers a compact hyper-rectangle and footer stats prune
    * scans filtered on any of `cols`. Pair with [[Compact.fileCountFor]]
    * to size `nFiles` from bytes.
    */
  def zOrderWrite(df: DataFrame, cols: Seq[String], outPath: String,
                  nFiles: Int, bits: Int = 8,
                  format: String = "parquet"): Unit = {
    require(nFiles > 0, "nFiles must be positive")
    withZValue(df, cols, bits)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").format(format).save(outPath)
  }
}
