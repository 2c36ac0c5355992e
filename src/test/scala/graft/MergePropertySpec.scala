package graft

import graft.ops.Merge
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Property-based checks of the merge invariants the reference's
  * double-execution relies on (T5, etl2.py:440-458) — over generated
  * random states, not just the hand-picked fixtures.
  */
class MergePropertySpec extends SparkSpec {
  import spark.implicits._

  private val now1 = lit("2021-01-01 00:00:00").cast("timestamp")
  private val now2 = lit("2022-01-01 00:00:00").cast("timestamp")

  // random (id, name, price) tables with overlapping key ranges, nulls
  // included, ~30 rows — enough to hit every merge class
  private val rowGen = for {
    id <- Gen.choose(0L, 40L)
    name <- Gen.oneOf(Gen.alphaStr.map(_.take(6)), Gen.const(null))
    price <- Gen.choose(0, 10000).map(_ / 100.0)
  } yield (id, name, price)

  private def tableGen = Gen.listOfN(30, rowGen)
    .map(_.distinctBy(_._1)) // PK-unique

  private def checkRound(seedA: Long, seedB: Long): Unit = {
    val params = Gen.Parameters.default
    val rowsA = tableGen(params, org.scalacheck.rng.Seed(seedA)).get
    val rowsB = tableGen(params, org.scalacheck.rng.Seed(seedB)).get
    val existing = rowsA.toDF("id", "name", "price")
      .withColumn("updated_at", lit("2020-01-01 00:00:00").cast("timestamp"))
      .withColumn("is_deleted", lit(false))
    val incoming = rowsB.toDF("id", "name", "price")

    val once = Merge.postState(incoming, existing, Seq("id"), now1)
      .cache()
    // 1. key preservation: keys(post) == keys(existing) ∪ keys(incoming)
    val keysPost = once.select("id").as[Long].collect().toSet
    val keysIn = rowsA.map(_._1).toSet ++ rowsB.map(_._1).toSet
    assert(keysPost == keysIn, s"seedA=$seedA seedB=$seedB keys diverge")
    // 2. PK uniqueness survives
    assert(once.count() == keysPost.size)
    // 3. idempotence: re-applying the same batch is a no-op
    val twice = Merge.postState(incoming, once, Seq("id"), now2)
    assert(rowsOf(twice.orderBy("id")) == rowsOf(once.orderBy("id")),
      s"seedA=$seedA seedB=$seedB not idempotent")
    // 4. history rows carry valid intervals and only changed/deleted keys
    val hist = Merge.scd2History(incoming, existing, Seq("id"), now = now1)
    assert(hist.filter(col("valid_from") > col("valid_to")).count() == 0)
    val histKeys = hist.select("id").as[Long].collect().toSet
    assert(histKeys.subsetOf(rowsA.map(_._1).toSet))
    once.unpersist()
  }

  test("merge invariants hold across random state pairs") {
    Seq((1L, 2L), (3L, 4L), (5L, 6L)).foreach { case (a, b) =>
      checkRound(a, b)
    }
  }

  test("merge with empty incoming tombstones everything not yet deleted") {
    val existing = Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "name", "price")
      .withColumn("updated_at", lit("2020-01-01 00:00:00").cast("timestamp"))
      .withColumn("is_deleted", col("id") === 2L)
    val incoming = existing.select("id", "name", "price").limit(0)
    val out = Merge.postState(incoming, existing, Seq("id"), now1)
    assert(out.filter(!col("is_deleted")).count() == 0)
    // already-deleted row keeps its original stamp (no churn)
    val stamps = out.select("id", "updated_at")
      .as[(Long, java.sql.Timestamp)].collect().toMap
    assert(stamps(2L) == java.sql.Timestamp.valueOf("2020-01-01 00:00:00"))
    assert(stamps(1L) != java.sql.Timestamp.valueOf("2020-01-01 00:00:00"))
  }

  test("merge with empty existing inserts everything") {
    val incoming = Seq((1L, "a", 1.0)).toDF("id", "name", "price")
    val existing = incoming.limit(0)
      .withColumn("updated_at", lit("2020-01-01 00:00:00").cast("timestamp"))
      .withColumn("is_deleted", lit(false))
    val out = Merge.postState(incoming, existing, Seq("id"), now1)
    assert(out.count() == 1)
    assert(out.filter(col("is_deleted")).count() == 0)
  }
}
