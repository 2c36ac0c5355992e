package graft

import graft.fakejdbc.{FakeDb, FakeDriver}
import graft.io.JdbcUpsert
import graft.model.{ColumnSpec, TableConfig}
import graft.ops.Merge
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** End-to-end S4-S7 sink coverage against the in-memory JDBC engine:
  * `executeUpdates` batching/commit cadence and the full `writeMerge`
  * insert/update/tombstone sequence, including double-apply idempotence
  * at the sink (etl2.py:440-458 re-runs the whole load and relies on it).
  */
class JdbcUpsertSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:graftmem:test"
  private val props = new java.util.Properties()
  private val ts2020 = java.sql.Timestamp.valueOf("2020-01-01 00:00:00")
  private val ts2021 = java.sql.Timestamp.valueOf("2021-01-01 00:00:00")
  private val ts2022 = java.sql.Timestamp.valueOf("2022-01-01 00:00:00")

  private val cfg = TableConfig("t", Seq(
    ColumnSpec("id", LongType, primaryKey = true),
    ColumnSpec("status", StringType),
    ColumnSpec("price", DoubleType),
    ColumnSpec("updated_at", TimestampType),
    ColumnSpec("is_deleted", BooleanType)))

  private def seedDb(): Unit = {
    FakeDriver.ensureRegistered()
    FakeDb.reset()
    FakeDb.createTable("t", Seq(
      "id" -> java.sql.Types.BIGINT, "status" -> java.sql.Types.VARCHAR,
      "price" -> java.sql.Types.DOUBLE,
      "updated_at" -> java.sql.Types.TIMESTAMP,
      "is_deleted" -> java.sql.Types.BOOLEAN))
    Seq(
      (1L, "A", 10.0, false), (2L, "B", 20.0, false),
      (3L, "C", 30.0, false), (4L, "D", 40.0, true)
    ).foreach { case (id, st, pr, del) =>
      FakeDb.insertRow("t", Map("id" -> id, "status" -> st, "price" -> pr,
        "updated_at" -> ts2020, "is_deleted" -> del))
    }
  }

  private def existingDf =
    FakeDb.rowsOf("t").map(r => (
        r("id").asInstanceOf[Long], r("status").asInstanceOf[String],
        r("price").asInstanceOf[Double],
        r("updated_at").asInstanceOf[java.sql.Timestamp],
        r("is_deleted").asInstanceOf[Boolean]))
      .toDF("id", "status", "price", "updated_at", "is_deleted")

  private val incoming = Seq(
    (1L, "A", 10.0),  // unchanged
    (2L, "B", 25.0),  // price changed -> update
    (5L, "E", 50.0)   // new -> insert
  ).toDF("id", "status", "price")
  // ids 3 (live) and 4 (already tombstoned) are absent -> delete class

  private def byId = FakeDb.rowsOf("t").map(r =>
    r("id").asInstanceOf[Long] -> r).toMap

  test("executeUpdates batches at batchSize and commits per batch") {
    FakeDriver.ensureRegistered()
    FakeDb.reset()
    FakeDb.createTable("t", Seq(
      "id" -> java.sql.Types.BIGINT, "price" -> java.sql.Types.DOUBLE))
    (1L to 7L).foreach(i =>
      FakeDb.insertRow("t", Map("id" -> i, "price" -> 0.0)))
    val updates = (1L to 7L).map(i => (i, i * 1.5)).toDF("id", "price")
      .repartition(1)
    JdbcUpsert.executeUpdates(updates, url, props, "t",
      setCols = Seq("price"), pk = Seq("id"), batchSize = 3)
    assert(byId(5L)("price") == 7.5)
    assert((1L to 7L).forall(i => byId(i)("price") == i * 1.5))
    val batches = FakeDb.events.filter(_.startsWith("updateBatch"))
      .map(_.split(":")(2).toInt).filter(_ > 0)
    assert(batches == Seq(3, 3, 1), s"batch cadence: $batches")
    // one commit per non-empty round-trip (plus possibly a final empty one)
    assert(FakeDb.events.count(_ == "commit") >= 3)
    val evs = FakeDb.events.filter(e =>
      e.startsWith("updateBatch") || e == "commit")
    // every executeBatch is followed by a commit before the next batch
    evs.sliding(2).foreach {
      case Seq(b, c) if b.startsWith("updateBatch") =>
        assert(c == "commit", s"batch not committed before next: $evs")
      case _ => ()
    }
  }

  test("writeMerge: inserts stamped, updates keep is_deleted, tombstones skip already-deleted") {
    seedDb()
    val changes = Merge.classify(incoming, existingDf, Seq("id"))
    JdbcUpsert.writeMerge(changes, cfg, url, props, batchSize = 2,
      now = lit("2021-01-01 00:00:00").cast("timestamp"))

    val rows = byId
    assert(rows.size == 5)
    // insert: bookkeeping stamped (was missing entirely before)
    assert(rows(5L)("status") == "E")
    assert(rows(5L)("updated_at") == ts2021)
    assert(rows(5L)("is_deleted") == false)
    // update: payload + updated_at refreshed, is_deleted untouched
    assert(rows(2L)("price") == 25.0)
    assert(rows(2L)("updated_at") == ts2021)
    assert(rows(2L)("is_deleted") == false)
    // unchanged row untouched
    assert(rows(1L)("updated_at") == ts2020)
    // live delete tombstoned
    assert(rows(3L)("is_deleted") == true)
    assert(rows(3L)("updated_at") == ts2021)
    // already-deleted row NOT restamped (idempotent tombstoning)
    assert(rows(4L)("is_deleted") == true)
    assert(rows(4L)("updated_at") == ts2020)
  }

  // The staged-merge CONTRACT (stage, one set-based statement, idempotent
  // re-apply, staging cleanup) runs against ALL THREE target grammars:
  // ANSI MERGE (SQL Server — the reference's sink), Postgres ON CONFLICT,
  // and MySQL ON DUPLICATE KEY. Same batch, same assertions; only the
  // statement the database sees differs (FakeDb logs merge:/upsert:/
  // dupkey: accordingly).
  for ((dialect, tag) <- Seq(JdbcUpsert.AnsiMerge -> "merge",
                             JdbcUpsert.PostgresOnConflict -> "upsert",
                             JdbcUpsert.MysqlOnDuplicateKey -> "dupkey"))
    test(s"executeMergeViaStaging [$tag]: updates matches, inserts the rest, idempotent") {
      seedDb()
      // snapshot batch with sink bookkeeping staged in (both grammars set
      // every non-pk column, so the batch carries the intended final state)
      val batch = Seq(
        (2L, "B", 25.0, ts2021, false), // existing -> UPDATE branch
        (5L, "E", 50.0, ts2021, false)  // new -> INSERT branch
      ).toDF("id", "status", "price", "updated_at", "is_deleted")
      JdbcUpsert.executeMergeViaStaging(batch, url, props, "t", pk = Seq("id"),
        dialect = dialect)

      val rows = byId
      assert(rows.size == 5)
      assert(rows(2L)("price") == 25.0 && rows(2L)("updated_at") == ts2021)
      assert(rows(5L)("status") == "E" && rows(5L)("is_deleted") == false)
      assert(rows(1L)("updated_at") == ts2020) // unmatched rows untouched
      assert(rows(4L)("is_deleted") == true)
      // the database saw ONE set-based statement, routed through staging
      val merges = FakeDb.events.filter(e =>
        e.startsWith("merge:") || e.startsWith("upsert:") ||
          e.startsWith("dupkey:"))
      assert(merges == Seq(s"$tag:t:upd=1:ins=1"), s"events: ${FakeDb.events}")
      // the auto-generated unique staging table is dropped after the commit
      assert(!FakeDb.tables.keySet.exists(_.startsWith("t_stg_")),
        s"staging tables leaked: ${FakeDb.tables.keySet}")

      // idempotence: re-staging and re-applying the same batch is a no-op
      val before = FakeDb.rowsOf("t").map(_.toMap).sortBy(_("id").toString)
      JdbcUpsert.executeMergeViaStaging(batch, url, props, "t", pk = Seq("id"),
        dialect = dialect)
      val after = FakeDb.rowsOf("t").map(_.toMap).sortBy(_("id").toString)
      assert(after == before, s"second merge mutated state:\n$before\nvs\n$after")
      assert(FakeDb.events.filter(e =>
          e.startsWith("merge:") || e.startsWith("upsert:") ||
            e.startsWith("dupkey:"))
        == Seq(s"$tag:t:upd=1:ins=1", s"$tag:t:upd=2:ins=0"))
    }

  test("mysqlUpsertSql emits the ON DUPLICATE KEY grammar") {
    val sql = JdbcUpsert.mysqlUpsertSql("t", "t_stg", Seq("id", "a", "b"),
      Seq("id"))
    assert(sql ==
      """INSERT INTO t (id, a, b) SELECT id, a, b FROM t_stg
        |ON DUPLICATE KEY UPDATE a = VALUES(a), b = VALUES(b)""".stripMargin)
  }

  test("upsertSql emits the Postgres ON CONFLICT grammar") {
    val sql = JdbcUpsert.upsertSql("t", "t_stg", Seq("id", "a", "b"), Seq("id"))
    assert(sql ==
      """INSERT INTO t (id, a, b) SELECT id, a, b FROM t_stg
        |ON CONFLICT (id) DO UPDATE SET a = EXCLUDED.a, b = EXCLUDED.b""".stripMargin)
  }

  test("all-pk staging degrades to the grammar's no-update form, " +
    "never an empty assignment list") {
    // every staged column is a key column (a pure key registry): an
    // empty `UPDATE SET `/`ON DUPLICATE KEY UPDATE ` is a syntax error
    // in all three grammars — each must emit its no-op-on-conflict form
    val pg = JdbcUpsert.upsertSql("t", "t_stg", Seq("id", "k"), Seq("id", "k"))
    assert(pg ==
      """INSERT INTO t (id, k) SELECT id, k FROM t_stg
        |ON CONFLICT (id, k) DO NOTHING""".stripMargin)
    val my = JdbcUpsert.mysqlUpsertSql("t", "t_stg", Seq("id", "k"),
      Seq("id", "k"))
    assert(my == "INSERT IGNORE INTO t (id, k) SELECT id, k FROM t_stg")
    val ansi = JdbcUpsert.mergeSql("t", "t_stg", Seq("id", "k"), Seq("id", "k"))
    assert(ansi ==
      """MERGE INTO t t USING t_stg s ON t.id = s.id AND t.k = s.k
        |WHEN NOT MATCHED THEN INSERT (id, k) VALUES (s.id, s.k)""".stripMargin)
  }

  test("staging table is dropped even when the merge statement itself fails") {
    // the merge fails AFTER the staging write (target doesn't exist) —
    // cleanup must still run, on a fresh connection, or every retry
    // leaks a uniquely-named orphan
    seedDb()
    val batch = Seq((2L, "B", 25.0, ts2021, false))
      .toDF("id", "status", "price", "updated_at", "is_deleted")
    intercept[Exception] {
      JdbcUpsert.executeMergeViaStaging(batch, url, props, "missing_target",
        pk = Seq("id"))
    }
    assert(!FakeDb.tables.keySet.exists(_.contains("_stg_")),
      s"staging tables leaked: ${FakeDb.tables.keySet}")
  }

  test("concurrent staged merges on one target stage under distinct names") {
    // Two writers merging into the same target AT THE SAME TIME: with a
    // shared staging name, writer B's overwrite could replace writer A's
    // staged batch between A's write and A's MERGE, silently double-applying
    // B and losing A. The per-call unique default makes this safe with no
    // caller discipline; this spec races the two writers for real.
    seedDb()
    val batchA = Seq(
      (2L, "B", 25.0, ts2021, false), // update branch
      (6L, "F", 60.0, ts2021, false)  // insert branch
    ).toDF("id", "status", "price", "updated_at", "is_deleted")
    val batchB = Seq(
      (3L, "C", 35.0, ts2021, false),
      (7L, "G", 70.0, ts2021, false)
    ).toDF("id", "status", "price", "updated_at", "is_deleted")

    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      Seq(batchA, batchB).map { b =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          override def call(): Unit = {
            barrier.await()
            JdbcUpsert.executeMergeViaStaging(b, url, props, "t", Seq("id"))
          }
        })
      }.foreach(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
    } finally pool.shutdown()

    // both writers' rows landed, disjoint keys untouched by the race
    val rows = byId
    assert(rows(2L)("price") == 25.0 && rows(6L)("status") == "F")
    assert(rows(3L)("price") == 35.0 && rows(7L)("status") == "G")
    assert(rows.size == 6)
    // the two batches were staged under DIFFERENT auto-generated names
    val staged = FakeDb.events.collect {
      case e if e.startsWith("insertBatch:t_stg_") => e.split(":")(1)
    }.toSet
    assert(staged.size == 2, s"staging names not unique: $staged")
    // short fixed-width suffix: stays inside tight identifier limits
    // (Postgres silently truncates names at 63 bytes)
    staged.foreach(n => assert(n.matches("t_stg_[0-9a-f]{12}"),
      s"unexpected staging name shape: $n"))
    // and neither staging table survives the merge
    assert(!FakeDb.tables.keySet.exists(_.startsWith("t_stg_")),
      s"staging tables leaked: ${FakeDb.tables.keySet}")
  }

  test("staged MERGE equals writeMerge on a tombstone-free batch") {
    // same incoming batch applied through BOTH sinks must converge to the
    // same table state (modulo the is_deleted caveat documented on
    // executeMergeViaStaging — batch carries the final bookkeeping here)
    seedDb()
    val changes = Merge.classify(incoming, existingDf, Seq("id"))
    JdbcUpsert.writeMerge(changes, cfg, url, props, batchSize = 2,
      now = lit("2021-01-01 00:00:00").cast("timestamp"))
    val viaUpdates = FakeDb.rowsOf("t").map(_.toMap)
      .filterNot(r => Seq(3L, 4L).contains(r("id").asInstanceOf[Long]))
      .sortBy(_("id").toString)

    seedDb()
    val staged = Seq(
      (2L, "B", 25.0, ts2021, false),
      (5L, "E", 50.0, ts2021, false)
    ).toDF("id", "status", "price", "updated_at", "is_deleted")
    JdbcUpsert.executeMergeViaStaging(staged, url, props, "t", pk = Seq("id"))
    val viaMerge = FakeDb.rowsOf("t").map(_.toMap)
      .filterNot(r => Seq(3L, 4L).contains(r("id").asInstanceOf[Long]))
      .sortBy(_("id").toString)
    assert(viaMerge == viaUpdates,
      s"sink divergence:\n$viaUpdates\nvs\n$viaMerge")
  }

  test("writeMerge double-apply against refreshed state is a sink no-op") {
    seedDb()
    JdbcUpsert.writeMerge(Merge.classify(incoming, existingDf, Seq("id")),
      cfg, url, props, batchSize = 2,
      now = lit("2021-01-01 00:00:00").cast("timestamp"))
    val after1 = FakeDb.rowsOf("t").map(_.toMap).sortBy(_("id").toString)

    // re-classify the SAME batch against the post-merge state and re-apply
    JdbcUpsert.writeMerge(Merge.classify(incoming, existingDf, Seq("id")),
      cfg, url, props, batchSize = 2,
      now = lit("2022-01-01 00:00:00").cast("timestamp"))
    val after2 = FakeDb.rowsOf("t").map(_.toMap).sortBy(_("id").toString)
    assert(after2 == after1,
      s"second apply mutated state:\n$after1\nvs\n$after2")
    assert(!after2.exists(_.values.toSeq.contains(ts2022)))
  }
}
