package graft

import graft.ops.Merge
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class MergeSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = java.sql.Timestamp.valueOf("2020-01-01 00:00:00")
  private val now = lit("2021-06-01 00:00:00").cast("timestamp")

  private def existing: DataFrame = Seq(
    (1L, "keep", 10.0, t0, false),
    (2L, "old", 20.0, t0, false),
    (3L, "gone", 30.0, t0, false),
    (4L, "already-deleted", 40.0, t0, true),
    (5L, Option.empty[String].orNull, 50.0, t0, false) // null payload column
  ).toDF("id", "name", "price", "updated_at", "is_deleted")

  private def incoming: DataFrame = Seq(
    (1L, "keep", 10.0),          // unchanged
    (2L, "new", 20.0),           // changed name
    (5L, Option.empty[String].orNull, 50.0), // unchanged (null == null, <=>)
    (6L, "fresh", 60.0)          // insert
  ).toDF("id", "name", "price")

  test("classify splits inserts / updates / deletes correctly") {
    val ch = Merge.classify(incoming, existing, Seq("id"))
    assert(ch.inserts.select("id").as[Long].collect().toSeq == Seq(6L))
    assert(ch.updates.select("id").as[Long].collect().toSeq == Seq(2L))
    assert(ch.updatesOld.select("name").as[String].collect().toSeq == Seq("old"))
    assert(ch.deletes.select("id").as[Long].collect().sorted.toSeq == Seq(3L, 4L))
  }

  test("classify is null-safe: null==null is NOT a change") {
    val ch = Merge.classify(incoming, existing, Seq("id"))
    assert(!ch.updates.select("id").as[Long].collect().contains(5L))
  }

  test("postState: insert, update preserving is_deleted, tombstone, pass-through") {
    val out = Merge.postState(incoming, existing, Seq("id"), now)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(4))).toSeq
    assert(out == Seq(
      (1L, "keep", false),            // untouched
      (2L, "new", false),             // updated, is_deleted preserved
      (3L, "gone", true),             // tombstoned
      (4L, "already-deleted", true),  // untouched (already tombstoned)
      (5L, null, false),              // untouched (null-safe compare)
      (6L, "fresh", false)))          // inserted
  }

  test("postState timestamps only touch changed rows") {
    val out = Merge.postState(incoming, existing, Seq("id"), now)
      .select("id", "updated_at").as[(Long, java.sql.Timestamp)].collect().toMap
    assert(out(1L) == t0 && out(4L) == t0 && out(5L) == t0)
    assert(out(2L) != t0 && out(3L) != t0 && out(6L) != t0)
  }

  test("merge is idempotent: applying the same batch twice changes nothing") {
    val once = Merge.postState(incoming, existing, Seq("id"), now)
    val twice = Merge.postState(incoming, once, Seq("id"),
      lit("2022-01-01 00:00:00").cast("timestamp"))
    // deleted rows re-absent from incoming must NOT re-tombstone/re-stamp
    assert(rowsOf(twice.orderBy("id")) == rowsOf(once.orderBy("id")))
  }

  test("merge(A, A-as-state) is a no-op") {
    val state = incoming
      .withColumn("updated_at", lit(t0))
      .withColumn("is_deleted", lit(false))
    val out = Merge.postState(incoming, state, Seq("id"), now)
    assert(rowsOf(out.orderBy("id")) == rowsOf(state.orderBy("id")))
  }

  test("scd2History captures superseded and deleted images with intervals") {
    val h = Merge.scd2History(incoming, existing, Seq("id"), now = now)
      .orderBy("id").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("name"),
        r.getAs[Boolean]("is_deleted"))).toSeq
    // id=2 superseded image (old name), id=3 deleted (flag forced true);
    // id=4 already deleted -> no new history
    assert(h == Seq((2L, "old", false), (3L, "gone", true)))
  }

  test("scd2History valid_from <= valid_to") {
    val bad = Merge.scd2History(incoming, existing, Seq("id"), now = now)
      .filter(col("valid_from") > col("valid_to")).count()
    assert(bad == 0)
  }

  test("scd2History appends are idempotent against recorded history") {
    val h1 = Merge.scd2History(incoming, existing, Seq("id"), now = now)
    val again = Merge.scd2History(incoming, existing, Seq("id"),
      existingHistory = Some(h1), now = now)
    assert(again.count() == 0)
  }
}
