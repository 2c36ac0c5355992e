package graft

import graft.fakejdbc.{FakeDb, FakeDriver}
import graft.io.JdbcUpsert
import graft.model.{ColumnSpec, TableConfig}
import graft.ops.Merge
import graft.rules.Rules
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's ACTUAL runtime, composed end-to-end (§3.1, etl2.py:
  * 440-467): trigger → read arrival folder → quality rules → classify →
  * merge into the JDBC store + SCD2 history — driven here as ONE
  * Structured Streaming query over a file source, across multiple
  * micro-batches, against the in-memory JDBC engine. Each stage is proven
  * in its own spec (StreamingSpec, RulesSpec, MergeSpec, JdbcUpsertSpec);
  * this one pins the COMPOSITION: state threads correctly from batch to
  * batch, history accumulates without duplication, and a re-delivered
  * batch is a loop-level no-op.
  */
class MicroBatchLoopSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:graftmem:loop"
  private val props = new java.util.Properties()
  private val ts2020 = java.sql.Timestamp.valueOf("2020-01-01 00:00:00")
  private val ts2021 = java.sql.Timestamp.valueOf("2021-01-01 00:00:00")
  private val ts2022 = java.sql.Timestamp.valueOf("2022-01-01 00:00:00")

  // declares the ARRIVING snapshot's shape (the reference validates the
  // source files, not the store — bookkeeping columns are sink-added);
  // writeMerge reads only name + primaryKey from it
  private val cfg = TableConfig("t", Seq(
    ColumnSpec("id", LongType, primaryKey = true),
    ColumnSpec("status", StringType),
    ColumnSpec("price", DoubleType)))

  private def existingDf: DataFrame =
    FakeDb.rowsOf("t").map(r => (
        r("id").asInstanceOf[Long], r("status").asInstanceOf[String],
        r("price").asInstanceOf[Double],
        r("updated_at").asInstanceOf[java.sql.Timestamp],
        r("is_deleted").asInstanceOf[Boolean]))
      .toDF("id", "status", "price", "updated_at", "is_deleted")

  private def byId = FakeDb.rowsOf("t").map(r =>
    r("id").asInstanceOf[Long] -> r).toMap

  test("full loop: file stream → rules → merge → JDBC, 2 batches + idempotent redelivery") {
    FakeDriver.ensureRegistered()
    FakeDb.reset()
    FakeDb.createTable("t", Seq(
      "id" -> java.sql.Types.BIGINT, "status" -> java.sql.Types.VARCHAR,
      "price" -> java.sql.Types.DOUBLE,
      "updated_at" -> java.sql.Types.TIMESTAMP,
      "is_deleted" -> java.sql.Types.BOOLEAN))
    Seq((1L, "A", 10.0), (2L, "B", 20.0), (3L, "C", 30.0)).foreach {
      case (id, st, pr) => FakeDb.insertRow("t", Map("id" -> id,
        "status" -> st, "price" -> pr, "updated_at" -> ts2020,
        "is_deleted" -> false))
    }

    val srcDir = java.nio.file.Files.createTempDirectory("loop_src").toString
    val ckptDir = java.nio.file.Files.createTempDirectory("loop_ck").toString
    val histDir = java.nio.file.Files
      .createTempDirectory("loop_hist").toString + "/history"

    // the injectable clock (F6): each micro-batch stamps a controlled time
    @volatile var nowStr = "2021-01-01 00:00:00"
    val violationCounts =
      scala.collection.mutable.ArrayBuffer.empty[Long]

    val schema = new StructType()
      .add("id", LongType).add("status", StringType).add("price", DoubleType)
    val q = spark.readStream.schema(schema).parquet(srcDir)
      .writeStream
      .option("checkpointLocation", ckptDir)
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
         _: Long) =>
        val now = lit(nowStr).cast("timestamp")
        // stage 4-6: the standard rule catalog over the arrived snapshot
        val res = Rules.applyAll(batch.toDF(), cfg,
          Map("t" -> batch.toDF()))
        violationCounts += res.violations.count()
        // stage 8: classify against the CURRENT database state, record
        // SCD2 history of superseded images (idempotently: the recorded
        // history's (pk, valid_from) anti-join drops re-delivered rows),
        // then apply insert/update/tombstone through the JDBC sink
        val existing = existingDf
        val hfs = new org.apache.hadoop.fs.Path(histDir)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val recorded =
          if (hfs.exists(new org.apache.hadoop.fs.Path(histDir)))
            Some(spark.read.parquet(histDir))
          else None
        Merge.scd2History(res.cleaned, existing, Seq("id"),
            existingHistory = recorded, now = now)
          .write.mode("append").parquet(histDir)
        JdbcUpsert.writeMerge(
          Merge.classify(res.cleaned, existing, Seq("id")),
          cfg, url, props, now = now)
        ()
      }
      .start()

    try {
      // ---- micro-batch 1: full snapshot — id2 price change, id4 new,
      // id3 absent (→ tombstone), plus a duplicate-pk row the
      // PrimaryKeyRule must drop before the sink sees it
      Seq((1L, "A", 10.0), (2L, "B", 25.0), (4L, "D", 40.0),
          (2L, "Z", 99.0)) // duplicate pk — rule violation, dropped
        .toDF("id", "status", "price")
        .coalesce(1).write.mode("append").parquet(srcDir)
      q.processAllAvailable()

      val s1 = byId
      assert(s1.size == 4)
      assert(s1(2L)("price") == 25.0 && s1(2L)("updated_at") == ts2021)
      assert(s1(4L)("status") == "D" && s1(4L)("is_deleted") == false)
      assert(s1(3L)("is_deleted") == true && s1(3L)("updated_at") == ts2021)
      assert(s1(1L)("updated_at") == ts2020) // unchanged row untouched
      // the duplicate-pk row was dropped by the rules, not merged
      assert(s1(2L)("status") == "B")
      assert(violationCounts.toSeq == Seq(1L))
      // history: superseded images of id2 (update) and id3 (delete)
      val h1 = spark.read.parquet(histDir)
        .select("id", "price", "is_deleted")
        .as[(Long, Double, Boolean)].collect().toSet
      assert(h1 == Set((2L, 20.0, false), (3L, 30.0, true)))

      // ---- micro-batch 2: next snapshot at a later clock — id4 price
      // change; id1 absent → tombstone; id2 unchanged
      nowStr = "2022-01-01 00:00:00"
      Seq((2L, "B", 25.0), (4L, "D", 45.0))
        .toDF("id", "status", "price")
        .coalesce(1).write.mode("append").parquet(srcDir)
      q.processAllAvailable()

      val s2 = byId
      assert(s2(4L)("price") == 45.0 && s2(4L)("updated_at") == ts2022)
      assert(s2(1L)("is_deleted") == true && s2(1L)("updated_at") == ts2022)
      assert(s2(2L)("updated_at") == ts2021) // unchanged since batch 1
      assert(s2(3L)("is_deleted") == true && s2(3L)("updated_at") == ts2021)
      val h2 = spark.read.parquet(histDir)
        .select("id", "price", "is_deleted")
        .as[(Long, Double, Boolean)].collect().toSet
      assert(h2 == h1 ++ Set((4L, 40.0, false), (1L, 10.0, true)))

      // ---- re-delivery: the SAME snapshot arrives again (a retried
      // trigger), at yet another clock — the loop must be a no-op:
      // nothing restamped, no new history
      nowStr = "2023-01-01 00:00:00"
      Seq((2L, "B", 25.0), (4L, "D", 45.0))
        .toDF("id", "status", "price")
        .coalesce(1).write.mode("append").parquet(srcDir)
      q.processAllAvailable()

      val s3 = FakeDb.rowsOf("t").map(_.toMap).sortBy(_("id").toString)
      val s2snap = s2.values.map(_.toMap).toSeq.sortBy(_("id").toString)
      assert(s3 == s2snap,
        s"re-delivered batch mutated state:\n$s2snap\nvs\n$s3")
      assert(spark.read.parquet(histDir).count() == 4,
        "re-delivered batch duplicated history rows")
    } finally q.stop()
  }
}
