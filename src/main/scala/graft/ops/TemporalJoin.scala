package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark's DataFrame API lacks as primitives:
  * as-of join (each left row picks the latest right row at-or-before its
  * timestamp, per key) and point-in-range join (each point row matched to
  * every interval containing it).
  *
  * Both are implemented in the shapes that survive 100 TB:
  *
  *  - `asofJoin` is ONE union + ONE window — a single hash shuffle on the
  *    join key and a per-key sort, never an inequality nested-loop join.
  *    The naive formulation (`l JOIN r ON key AND r.t <= l.t` + keep max)
  *    materializes every (event, earlier-order) pair before pruning —
  *    quadratic per key — and Spark plans non-equi conditions it cannot
  *    hash as BroadcastNestedLoopJoin. The merge-style union sort is how
  *    kdb/QuestDB/Flink implement ASOF natively; re-expressed here as a
  *    Catalyst window so codegen and AQE still apply.
  *
  *  - `rangeJoinByBucket` turns an interval predicate into an equi-join on
  *    a coarse bucket key (each interval exploded to the buckets it
  *    overlaps, each point hashed to its bucket) + an exact refine filter.
  *    Cost is |points| + Σ interval-spans/bucketWidth join rows instead of
  *    the |points| × |intervals| of a nested loop, and the equi-key lets
  *    Spark pick hash/sort-merge joins with AQE skew splitting.
  *
  * Reference behavior note: the reference pipeline has no temporal-join
  * operator (its incremental loads key on `updated_at` comparisons only —
  * etl2.py:372-380); these close the gap a time-series user of any OLAP
  * engine hits first.
  */
object TemporalJoin {

  /** As-of join: for every left row, attach `rightCols` from the single
    * right row with the same key and the greatest `rightTime <= leftTime`
    * (or strictly `<` when `strict`). Ties on `rightTime` break to the
    * greatest `tieBreak` value, making the result deterministic — plain
    * SQL ASOF leaves tied picks engine-defined.
    *
    * Plan shape: union both sides tagged with a sort rank, one window
    * `last(payload, ignoreNulls) OVER (PARTITION BY key ORDER BY time,
    * side, tie)` running forward, keep left rows. One Exchange on the key;
    * a hot key serializes only its own partition's sort (use
    * `Skew.profile` first if one key dominates).
    */
  def asofJoin(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTime: String, rightTime: String,
               rightCols: Seq[String],
               tieBreak: String,
               strict: Boolean = false): DataFrame = {
    val payload = struct((rightTime +: tieBreak +: rightCols).distinct
      .map(col): _*)
    val payloadType = right.select(payload).schema.head.dataType
    val leftStruct = struct(left.columns.map(col): _*)
    val leftType = left.select(leftStruct).schema.head.dataType
    val tieType = right.select(col(tieBreak)).schema.head.dataType

    // Right rows must sort BEFORE a left row with the same timestamp for
    // inclusive (<=) semantics, AFTER it for strict (<).
    val (rightOrd, leftOrd) = if (strict) (1, 0) else (0, 1)

    val l = left.select(
      col(leftKey).as("__k"), col(leftTime).as("__t"),
      lit(leftOrd).as("__side"), lit(null).cast(tieType).as("__tie"),
      leftStruct.as("__l"), lit(null).cast(payloadType).as("__r"))
    val r = right.select(
      col(rightKey).as("__k"), col(rightTime).as("__t"),
      lit(rightOrd).as("__side"), col(tieBreak).as("__tie"),
      lit(null).cast(leftType).as("__l"), payload.as("__r"))

    // Among right rows sharing (__k, __t) the LAST in tie order wins the
    // running last(), i.e. the max tieBreak. Left rows' null __tie sorts
    // first within their (t, side) group, which is irrelevant: all right
    // rows at that timestamp already sorted apart via __side.
    val w = Window.partitionBy("__k")
      .orderBy(col("__t").asc, col("__side").asc, col("__tie").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = l.unionByName(r)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === leftOrd)

    val out = left.columns.map(c => col(s"__l.$c").as(c)) ++
      rightCols.map(c => col(s"__m.$c").as(c))
    matched.select(out: _*)
  }

  /** Point-in-range join on long-valued coordinates: `points` rows carry
    * `pointCol`; `ranges` rows carry `[startCol, endCol)` half-open
    * intervals. Returns every (point, containing-interval) pair with all
    * columns from both sides.
    *
    * Each interval explodes to `ceil(span / bucketWidth)` coarse buckets;
    * each point hashes to one. The join is then a plain equi-join on the
    * bucket id refined by the exact containment predicate — never a
    * nested loop. Choose `bucketWidth` ≈ the typical interval span: wider
    * wastes refine work, narrower multiplies interval replication.
    */
  def rangeJoinByBucket(points: DataFrame, pointCol: String,
                        ranges: DataFrame, startCol: String, endCol: String,
                        bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val exploded = ranges.withColumn("__bucket",
      explode(sequence(
        floor(col(startCol).cast("long") / bucketWidth).cast("long"),
        floor((col(endCol).cast("long") - 1) / bucketWidth).cast("long"))))
    val keyed = points.withColumn("__bucket",
      floor(col(pointCol).cast("long") / bucketWidth).cast("long"))
    keyed.join(exploded, Seq("__bucket"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__bucket")
  }
}
