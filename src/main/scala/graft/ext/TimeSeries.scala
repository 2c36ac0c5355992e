package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: turn an irregular event stream into a
  * fixed-step grid with forward-filled values (gap filling / "last
  * observation carried forward") — the resampling step before any
  * windowed model sees sensor/metric data.
  */
object TimeSeries {

  /** Per-key fixed-step grid from `floor(min ts)` to `max ts`, each grid
    * point carrying the latest observation at-or-before it (ties among
    * simultaneous observations resolve to the highest `idCol` —
    * deterministic). Grid points before a key's first observation stay
    * null.
    *
    * Shape: the grid is one row per (key, step) from a `sequence`
    * explode of per-key bounds; the fill is ONE union + ONE window pass
    * ordered by (ts, is_grid, id) — events sort immediately before the
    * grid points they serve, so `last(value, ignoreNulls)` over the
    * preceding frame IS the as-of lookup, with no per-grid-point probe
    * join. Shuffle carries (key, ts, value, id); state per window
    * partition is one running value.
    */
  def forwardFillGrid(events: DataFrame, keyCol: String, tsCol: String,
                      valueCol: String, idCol: String,
                      step: String = "1 hour"): DataFrame = {
    // Anchor the grid by truncating min(ts) to the STEP's unit — a
    // "1 day" grid floored to the hour would start mid-day and every
    // grid point would be misaligned. "15 minutes" → "minute", etc.
    val truncUnit = step.trim.toLowerCase.split("\\s+").last.stripSuffix("s")
    val validUnits =
      Set("year", "quarter", "month", "week", "day", "hour", "minute", "second")
    require(validUnits.contains(truncUnit),
      s"forwardFillGrid: unsupported step unit '$truncUnit' in step '$step'")
    val bounds = events.groupBy(col(keyCol))
      .agg(date_trunc(truncUnit, min(col(tsCol))).as("__lo"),
        max(col(tsCol)).as("__hi"))
    val grid = bounds.select(col(keyCol),
      explode(sequence(col("__lo"), col("__hi"),
        expr(s"interval $step"))).as("__t"))
    val evRows = events.select(col(keyCol), col(tsCol).as("__t"),
      col(valueCol).as("__v"), lit(0).as("__is_grid"),
      col(idCol).cast("long").as("__id"))
    val gridRows = grid.select(col(keyCol), col("__t"),
      lit(null).cast("double").as("__v"), lit(1).as("__is_grid"),
      lit(null).cast("long").as("__id"))
    val w = Window.partitionBy(keyCol)
      .orderBy(col("__t"), col("__is_grid"), col("__id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    evRows.unionByName(gridRows)
      .withColumn("filled", last(col("__v"), ignoreNulls = true).over(w))
      .filter(col("__is_grid") === 1)
      .select(col(keyCol), col("__t").as("grid_ts"), col("filled"))
  }
}
