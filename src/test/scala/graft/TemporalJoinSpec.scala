package graft

import graft.ops.TemporalJoin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class TemporalJoinSpec extends SparkSpec {
  import spark.implicits._

  // quotes: (key, time, qid, price) — qid is the deterministic tie-break
  private def quotes: DataFrame = Seq(
    ("a", 10L, 1L, 1.0),
    ("a", 20L, 2L, 2.0),
    ("a", 20L, 3L, 3.0), // tie on time with qid=2 — qid=3 must win
    ("a", 30L, 4L, 4.0),
    ("b", 15L, 5L, 5.0)
  ).toDF("k", "t", "qid", "price")

  private def trades: DataFrame = Seq(
    ("a", 5L, 100L),  // before any quote -> null
    ("a", 20L, 101L), // equal time -> inclusive picks qid=3, strict qid=1
    ("a", 25L, 102L), // between -> qid=3
    ("a", 99L, 103L), // after all -> qid=4
    ("b", 15L, 104L), // equal time on other key
    ("c", 50L, 105L)  // key with no quotes -> null
  ).toDF("k", "t", "tid")

  test("asofJoin inclusive: latest at-or-before, max tie-break wins") {
    val out = TemporalJoin.asofJoin(trades, quotes, "k", "k", "t", "t",
        rightCols = Seq("qid", "price"), tieBreak = "qid")
      .select("tid", "qid", "price")
      .collect().map(r => (r.getLong(0), (Option(r.get(1)), Option(r.get(2)))))
      .toMap
    assert(out(100L) == ((None, None)))
    assert(out(101L) == ((Some(3L), Some(3.0))))
    assert(out(102L) == ((Some(3L), Some(3.0))))
    assert(out(103L) == ((Some(4L), Some(4.0))))
    assert(out(104L) == ((Some(5L), Some(5.0))))
    assert(out(105L) == ((None, None)))
  }

  test("asofJoin strict: equal timestamps excluded") {
    val out = TemporalJoin.asofJoin(trades, quotes, "k", "k", "t", "t",
        rightCols = Seq("qid"), tieBreak = "qid", strict = true)
      .select("tid", "qid")
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap
    assert(out(101L) == Some(1L)) // 20 excluded, falls back to t=10
    assert(out(104L) == None)     // b's only quote is at the same instant
    assert(out(102L) == Some(3L)) // unaffected
  }

  test("asofJoin preserves every left row exactly once and all left columns") {
    val out = TemporalJoin.asofJoin(trades, quotes, "k", "k", "t", "t",
      rightCols = Seq("price"), tieBreak = "qid")
    assert(out.columns.toSeq == Seq("k", "t", "tid", "price"))
    assert(out.count() == trades.count())
    assert(out.select("tid").distinct().count() == trades.count())
  }

  test("asofJoin matches the naive quadratic formulation on random data") {
    val n = 500
    val left = spark.range(n).select(
      (col("id") % 13).as("k"), pmod(col("id") * 37 + 11, lit(200)).as("t"),
      col("id").as("lid"))
    val right = spark.range(300).select(
      (col("id") % 17).as("k"), pmod(col("id") * 53 + 7, lit(200)).as("t"),
      col("id").as("rid"))

    val fast = TemporalJoin.asofJoin(left, right, "k", "k", "t", "t",
        rightCols = Seq("rid"), tieBreak = "rid")
      .select("lid", "rid")
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap

    // naive: all pairs, keep max (t, rid)
    val naive = left.as("l")
      .join(right.as("r"),
        col("l.k") === col("r.k") && col("r.t") <= col("l.t"), "left")
      .groupBy(col("l.lid"))
      .agg(max(struct(col("r.t"), col("r.rid"))).as("best"))
      .select(col("lid"), col("best.rid").as("rid"))
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap

    assert(fast == naive)
  }

  test("asofJoin plans one shuffle and no nested-loop join") {
    val plan = TemporalJoin.asofJoin(trades, quotes, "k", "k", "t", "t",
      rightCols = Seq("price"), tieBreak = "qid")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
    // one Exchange for the window partitioning (union branches share it)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size <= 2)
  }

  private def intervals: DataFrame = Seq(
    (1L, 0L, 10L),   // one bucket (width 10)
    (2L, 5L, 25L),   // spans three buckets
    (3L, 25L, 26L),  // single-point interval
    (4L, 40L, 41L)   // matches nothing
  ).toDF("rid", "lo", "hi")

  private def points: DataFrame = Seq(
    (1L, 0L), (2L, 9L), (3L, 10L), (4L, 24L), (5L, 25L), (6L, 26L), (7L, 99L)
  ).toDF("pid", "p")

  test("rangeJoinByBucket: half-open containment, multi-bucket intervals") {
    val out = TemporalJoin.rangeJoinByBucket(points, "p", intervals,
        "lo", "hi", bucketWidth = 10)
      .select("pid", "rid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 1L), (2L, 1L), (2L, 2L), (3L, 2L), (4L, 2L),
      (5L, 3L)))
  }

  test("rangeJoinByBucket matches the naive inequality join for any width") {
    val naive = points.join(intervals,
        col("p") >= col("lo") && col("p") < col("hi"))
      .select("pid", "rid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (w <- Seq(1L, 3L, 10L, 100L)) {
      val got = TemporalJoin.rangeJoinByBucket(points, "p", intervals,
          "lo", "hi", bucketWidth = w)
        .select("pid", "rid")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == naive, s"width=$w")
    }
  }

  test("rangeJoinByBucket plans an equi-join, not a nested loop") {
    val plan = TemporalJoin.rangeJoinByBucket(points, "p", intervals,
        "lo", "hi", bucketWidth = 10)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
  }
}
