package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-step funnel conversion over an event log — the product-analytics
  * staple: of the users who did step 1, how many went on to do step 2
  * AFTER it, then step 3 after that, … Strictly ordered semantics
  * (each step's timestamp must be strictly later than the previous
  * step's), using each user's EARLIEST qualifying time per step — the
  * standard "first touch" funnel definition.
  *
  * Scale shape: one aggregation per step over the (filtered) event
  * log, each producing one tiny (user, t_step) relation that joins
  * back; the event log is scanned per step but never self-joined
  * row-to-row, and every intermediate carries one row per surviving
  * user. For very long funnels a single-pass
  * `min_by`-over-sorted-events formulation trades scans for state —
  * at the usual 3-5 steps, per-step aggregation keeps every join
  * broadcast-small.
  */
object Funnel {

  /** Per-user earliest completion time of each funnel step (strictly
    * ordered). Output: one row per user who completed step 1, with
    * nullable `t_1 … t_n` timestamps — `t_i` null ⇒ every later step
    * is null too. Step columns are named `t_<i>` (1-based).
    */
  def stepTimes(events: DataFrame, userCol: String, typeCol: String,
                tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val first = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol))
      .agg(min(col(tsCol)).as("t_1"))
    steps.zipWithIndex.drop(1).foldLeft(first) { case (acc, (step, i)) =>
      val prev = s"t_$i"
      val cur = s"t_${i + 1}"
      val nxt = events.filter(col(typeCol) === step)
        .select(col(userCol), col(tsCol).as("__ts"))
      acc.join(nxt, Seq(userCol), "left")
        .groupBy((userCol +: (1 to i).map(j => s"t_$j")).map(col): _*)
        .agg(min(when(col("__ts") > col(prev), col("__ts"))).as(cur))
    }
  }

  /** The funnel report: per step, how many users reached it and the
    * conversion rate from the previous step, floor-truncated to 4
    * decimals. Truncation (not `round`) on purpose: a ratio landing on
    * an x.xxxx5 half-boundary rounds differently across engines (Spark
    * rounds the shortest decimal representation of the double, other
    * engines round the binary value), while `floor(x*1e4)/1e4` is
    * boundary-proof — same convention as TextOps.qualityScore.
    */
  def conversion(events: DataFrame, userCol: String, typeCol: String,
                 tsCol: String, steps: Seq[String]): DataFrame = {
    val times = stepTimes(events, userCol, typeCol, tsCol, steps)
    val counts = times.agg(
      count(col("t_1")).as("n_1"),
      (2 to steps.length).map(i =>
        count(col(s"t_$i")).as(s"n_$i")): _*)
    val stepRows = steps.zipWithIndex.map { case (step, i) =>
      val n = col(s"n_${i + 1}")
      val prev = if (i == 0) n else col(s"n_$i")
      struct(lit(i + 1).cast("long").as("step"), lit(step).as("event_type"),
        n.as("n_users"),
        when(prev > 0, floor(n.cast("double") / prev * 1e4) / 1e4)
          .otherwise(lit(0.0)).as("conversion"))
    }
    counts.select(explode(array(stepRows: _*)).as("s"))
      .select("s.step", "s.event_type", "s.n_users", "s.conversion")
  }
}
