package graft.io

import graft.model.TableConfig
import org.apache.spark.sql.DataFrame

/** Keyed JDBC UPDATE / upsert sink (S6/S7, etl2.py:372-380, 405-412).
  *
  * Spark has no DataFrame UPDATE; the reference updates row-at-a-time from
  * the driver. Here updates are executed from EXECUTORS via
  * `foreachPartition` + batched `PreparedStatement` — each partition opens
  * one connection, addBatch()es `batchSize` rows per round-trip
  * (the reference's chunksize=5000, etl2.py:301), and commits per batch.
  * Scale shape: writes parallelize with partitions; the database sees
  * |partitions| connections, each streaming batches.
  *
  * SQL text generation is separated from execution so it is unit-testable
  * without a database (none ships in this container).
  */
object JdbcUpsert {

  /** `UPDATE t SET c=?, ... , updated_at=? WHERE pk=? AND ...` — the
    * reference's per-changed-row statement (etl2.py:372-380), parameterized.
    */
  def updateSql(table: String, setCols: Seq[String], pk: Seq[String]): String = {
    require(setCols.nonEmpty && pk.nonEmpty)
    val sets = setCols.map(c => s"$c = ?").mkString(", ")
    val keys = pk.map(c => s"$c = ?").mkString(" AND ")
    s"UPDATE $table SET $sets WHERE $keys"
  }

  /** Tombstone statement (etl2.py:405-412). */
  def tombstoneSql(table: String, pk: Seq[String]): String =
    updateSql(table, Seq("is_deleted", "updated_at"), pk)

  /** ANSI MERGE for engines that support it — pushed as one statement
    * against a staged batch table (the set-based alternative to per-row
    * updates; preferred when the target database allows it).
    */
  def mergeSql(table: String, staging: String, cols: Seq[String],
               pk: Seq[String]): String = {
    val on = pk.map(c => s"t.$c = s.$c").mkString(" AND ")
    val nonPk = cols.filterNot(pk.contains)
    val insertCols = cols.mkString(", ")
    val insertVals = cols.map(c => s"s.$c").mkString(", ")
    // All-pk staging: an empty UPDATE SET list is invalid — drop the
    // WHEN MATCHED branch entirely (matched rows need no change).
    if (nonPk.isEmpty)
      s"""MERGE INTO $table t USING $staging s ON $on
         |WHEN NOT MATCHED THEN INSERT ($insertCols) VALUES ($insertVals)""".stripMargin
    else {
      val sets = nonPk.map(c => s"t.$c = s.$c").mkString(", ")
      s"""MERGE INTO $table t USING $staging s ON $on
         |WHEN MATCHED THEN UPDATE SET $sets
         |WHEN NOT MATCHED THEN INSERT ($insertCols) VALUES ($insertVals)""".stripMargin
    }
  }

  /** PostgreSQL upsert grammar for the same staged-batch contract:
    * `INSERT … SELECT … ON CONFLICT (pk) DO UPDATE SET c = EXCLUDED.c`.
    * Available since PG 9.5 (PG 15 also accepts ANSI MERGE, but ON
    * CONFLICT is the native idiom and atomically handles the concurrent-
    * insert race MERGE leaves to the caller). Requires a unique index on
    * the pk — which the merged target's primary key is.
    */
  def upsertSql(table: String, staging: String, cols: Seq[String],
                pk: Seq[String]): String = {
    require(cols.toSet.intersect(pk.toSet).size == pk.size,
      s"staged columns must include every pk column ${pk.mkString(",")}")
    val insertCols = cols.mkString(", ")
    val nonPk = cols.filterNot(pk.contains)
    // All-pk staging (a pure key registry) has nothing to update — `DO
    // UPDATE SET ` with an empty list is a syntax error; DO NOTHING is
    // the correct (and idempotent) degenerate form.
    if (nonPk.isEmpty)
      s"""INSERT INTO $table ($insertCols) SELECT $insertCols FROM $staging
         |ON CONFLICT (${pk.mkString(", ")}) DO NOTHING""".stripMargin
    else {
      val sets = nonPk.map(c => s"$c = EXCLUDED.$c").mkString(", ")
      s"""INSERT INTO $table ($insertCols) SELECT $insertCols FROM $staging
         |ON CONFLICT (${pk.mkString(", ")}) DO UPDATE SET $sets""".stripMargin
    }
  }

  /** MySQL upsert grammar for the same staged-batch contract:
    * `INSERT … SELECT … ON DUPLICATE KEY UPDATE c = VALUES(c)`.
    * MySQL resolves the conflict against ANY unique key of the target —
    * there is no explicit conflict-column list — so `pk` here only
    * determines which columns the UPDATE branch sets (the non-pk ones),
    * and the target's primary key must be the intended merge key.
    * `VALUES(col)` is the portable form (predates the 8.0.20 row-alias
    * syntax and still accepted).
    */
  def mysqlUpsertSql(table: String, staging: String, cols: Seq[String],
                     pk: Seq[String]): String = {
    require(cols.toSet.intersect(pk.toSet).size == pk.size,
      s"staged columns must include every pk column ${pk.mkString(",")}")
    val insertCols = cols.mkString(", ")
    val nonPk = cols.filterNot(pk.contains)
    // All-pk staging: `ON DUPLICATE KEY UPDATE ` with an empty
    // assignment list is invalid MySQL. INSERT IGNORE is the matching
    // degenerate form (nothing to update on conflict, new keys still
    // land) — same semantics as Postgres' DO NOTHING above.
    if (nonPk.isEmpty)
      s"INSERT IGNORE INTO $table ($insertCols) SELECT $insertCols FROM $staging"
    else {
      val sets = nonPk.map(c => s"$c = VALUES($c)").mkString(", ")
      s"""INSERT INTO $table ($insertCols) SELECT $insertCols FROM $staging
         |ON DUPLICATE KEY UPDATE $sets""".stripMargin
    }
  }

  /** Target-database grammar for the staged-batch merge: the statement
    * differs per engine, the staging contract (overwrite-stage, one
    * set-based statement, idempotent re-apply) does not.
    */
  sealed trait MergeDialect {
    def statement(table: String, staging: String, cols: Seq[String],
                  pk: Seq[String]): String
  }

  /** ANSI `MERGE` — SQL Server (the reference's target), Oracle, DB2. */
  case object AnsiMerge extends MergeDialect {
    def statement(table: String, staging: String, cols: Seq[String],
                  pk: Seq[String]): String = mergeSql(table, staging, cols, pk)
  }

  /** PostgreSQL `INSERT … ON CONFLICT DO UPDATE`. */
  case object PostgresOnConflict extends MergeDialect {
    def statement(table: String, staging: String, cols: Seq[String],
                  pk: Seq[String]): String = upsertSql(table, staging, cols, pk)
  }

  /** MySQL/MariaDB `INSERT … ON DUPLICATE KEY UPDATE`. */
  case object MysqlOnDuplicateKey extends MergeDialect {
    def statement(table: String, staging: String, cols: Seq[String],
                  pk: Seq[String]): String =
      mysqlUpsertSql(table, staging, cols, pk)
  }

  // Copy via stringPropertyNames, not putAll: putAll ignores a Properties'
  // DEFAULTS table, silently dropping credentials supplied via
  // `new Properties(defaults)`.
  private def copyProps(props: java.util.Properties): java.util.Properties = {
    val out = new java.util.Properties()
    props.stringPropertyNames().forEach { k =>
      out.setProperty(k, props.getProperty(k))
    }
    out
  }

  /** Execute the staging-table MERGE path end-to-end: stage `batch`
    * through the stock JDBC writer (overwrite — the staging table always
    * reflects exactly this batch), then apply ONE set-based
    * [[mergeSql]] statement. The preferred sink on engines with MERGE
    * (SQL Server, the reference's real target — etl2.py:18-21): the
    * match/update/insert decision runs inside the database over the whole
    * batch instead of per-row round-trips, and re-running is idempotent
    * by construction (re-merging an already-merged staging batch changes
    * nothing).
    *
    * Note the semantic difference from [[writeMerge]]: MERGE's UPDATE
    * branch sets every non-pk staging column on matched rows — including
    * `is_deleted` if staged — while `writeMerge` preserves the target's
    * `is_deleted` on updates. Stage tombstone-free batches (or stage the
    * intended final `is_deleted`) accordingly.
    */
  def executeMergeViaStaging(batch: DataFrame, url: String,
                             props: java.util.Properties, table: String,
                             pk: Seq[String],
                             staging: String = "",
                             dialect: MergeDialect = AnsiMerge): Unit = {
    require(batch.columns.toSeq.intersect(pk).size == pk.size,
      s"batch must carry every pk column ${pk.mkString(",")}")
    // The default staging name is UNIQUE PER CALL (target + random
    // suffix), so two concurrent jobs merging into the same target are
    // safe by default — a shared per-target name would let writer B
    // overwrite writer A's staged batch between A's write and A's MERGE.
    // 12 hex chars is ample per-call uniqueness while keeping the name
    // inside tight identifier limits (Postgres truncates at 63 bytes —
    // SILENTLY, which would alias two "distinct" staging names).
    // Auto-generated staging tables are dropped once the merge commits;
    // an explicitly passed `staging` name is the caller's to manage
    // (kept afterwards, e.g. for inspection).
    val auto = staging.isEmpty
    val stg = if (auto) {
      val suffix = java.util.UUID.randomUUID().toString.replace("-", "").take(12)
      s"${table}_stg_$suffix"
    } else staging
    batch.write.mode("overwrite").jdbc(url, stg, copyProps(props))
    // From here the staging table exists, so the cleanup scope must cover
    // EVERYTHING that can fail after the write — including statement
    // construction and connection acquisition, not just the merge itself.
    try {
      val sql = dialect.statement(table, stg, batch.columns.toSeq, pk)
      val conn = java.sql.DriverManager.getConnection(url, props)
      try {
        conn.setAutoCommit(false)
        val st = conn.createStatement()
        try {
          st.executeUpdate(sql)
          conn.commit()
        } catch {
          case e: Throwable =>
            try conn.rollback() catch { case r: Throwable => e.addSuppressed(r) }
            throw e
        } finally st.close()
      } finally conn.close()
    } finally {
      // best-effort drop on BOTH paths, via a FRESH connection (the merge
      // connection may never have been acquired, or may be poisoned): a
      // failed merge must not leak a uniquely-named orphan per retry, and
      // a cleanup failure must not mask an already-committed merge
      if (auto) {
        try {
          val c = java.sql.DriverManager.getConnection(url, props)
          try {
            val st = c.createStatement()
            try st.executeUpdate(s"DROP TABLE IF EXISTS $stg")
            finally st.close()
            if (!c.getAutoCommit) c.commit()
          } finally c.close()
        } catch { case _: Throwable => () }
      }
    }
  }

  /** Execute batched keyed UPDATEs from executors. `df` must carry
    * `setCols ++ pk`. Connections come from DriverManager with the given
    * url/props (executors must have the JDBC driver on their classpath).
    */
  def executeUpdates(df: DataFrame, url: String,
                     props: java.util.Properties, table: String,
                     setCols: Seq[String], pk: Seq[String],
                     batchSize: Int = 5000): Unit = {
    val sql = updateSql(table, setCols, pk)
    val cols = setCols ++ pk
    val indexed = cols.zipWithIndex // 0-based → 1-based JDBC params
    df.select(cols.head, cols.tail: _*).foreachPartition {
      rows: Iterator[org.apache.spark.sql.Row] =>
        if (rows.nonEmpty) {
          val conn = java.sql.DriverManager.getConnection(url, props)
          try {
            conn.setAutoCommit(false)
            val st = conn.prepareStatement(sql)
            var n = 0
            rows.foreach { r =>
              indexed.foreach { case (_, i) => st.setObject(i + 1, r.get(i)) }
              st.addBatch()
              n += 1
              if (n % batchSize == 0) { st.executeBatch(); conn.commit() }
            }
            st.executeBatch(); conn.commit()
          } finally conn.close()
        }
    }
  }

  /** Full merge write for one table: inserts appended through the stock
    * JDBC writer (S5), updates + tombstones through `executeUpdates`.
    * Mirrors the reference's bookkeeping exactly (etl2.py:329-412):
    * inserts and updates stamped `updated_at = now` / `is_deleted = false`
    * (etl2.py:111-112), tombstones restricted to not-yet-deleted rows so a
    * re-applied batch is a sink-level no-op (T5, etl2.py:440-458 re-runs
    * the whole load and relies on this).
    *
    * `now` is injectable for deterministic tests (SURVEY.md §7.4).
    */
  def writeMerge(changes: graft.ops.Merge.Changes, cfg: TableConfig,
                 url: String, props: java.util.Properties,
                 batchSize: Int = 5000,
                 now: org.apache.spark.sql.Column =
                   org.apache.spark.sql.functions.current_timestamp()): Unit = {
    // no wildcard functions import: it would shadow the `now` parameter
    import org.apache.spark.sql.functions.{col, lit}
    // connection properties (credentials, driver) must reach the insert
    // path too — merge them into the writer options alongside batchsize
    val insertProps = copyProps(props)
    insertProps.setProperty("batchsize", batchSize.toString)
    changes.inserts
      .withColumn("updated_at", now)
      .withColumn("is_deleted", lit(false))
      .write.mode("append").jdbc(url, cfg.name, insertProps)

    // updates refresh the payload + updated_at but KEEP the row's
    // is_deleted (etl2.py:376-378; postState does the same) — so
    // is_deleted is excluded even if the incoming snapshot carries it,
    // and updated_at is deduped in case incoming carries it too (a
    // duplicate SET column is a SQL error on most engines)
    val nonPk = changes.updates.columns.toSeq
      .filterNot(cfg.primaryKey.contains)
      .filterNot(_ == "is_deleted")
    val updates = changes.updates.withColumn("updated_at", now)
    executeUpdates(updates, url, props, cfg.name,
      (nonPk :+ "updated_at").distinct, cfg.primaryKey, batchSize)

    // `classify` reports every existing key absent from incoming as a
    // delete, including rows already tombstoned — restamping those every
    // run would churn updated_at forever. Filter them here at the sink.
    val notYetDeleted =
      if (changes.deletes.columns.contains("is_deleted")) !col("is_deleted")
      else lit(true)
    val tomb = changes.deletes.filter(notYetDeleted)
      .withColumn("is_deleted", lit(true))
      .withColumn("updated_at", now)
    executeUpdates(tomb, url, props, cfg.name,
      Seq("is_deleted", "updated_at"), cfg.primaryKey, batchSize)
  }
}
