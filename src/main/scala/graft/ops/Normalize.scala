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
    * are small by construction) but must never be applied to facts. For a
    * fact-sized surrogate use `zipWithUniqueId`-style ids instead.
    */
  def dimensionWithSurrogate(df: DataFrame, cols: Seq[String],
                             idCol: String): DataFrame = {
    val w = Window.orderBy(cols.map(col): _*)
    df.select(cols.map(col): _*).distinct()
      .withColumn(idCol, row_number().over(w))
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
