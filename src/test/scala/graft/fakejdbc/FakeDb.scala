package graft.fakejdbc

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.sql.{Connection, DatabaseMetaData, PreparedStatement, ResultSet,
  ResultSetMetaData, SQLException, Statement}
import scala.collection.concurrent.TrieMap
import scala.collection.mutable

/** Minimal in-memory JDBC engine for exercising the S4-S7 sink paths
  * end-to-end without a database in the container: a real
  * `java.sql.Driver` registered with `DriverManager` (so Spark's stock
  * JDBC writer resolves it from the URL), with Connection / Statement /
  * metadata surfaces implemented via dynamic proxies — only the methods
  * Spark's `JdbcUtils` write path and `JdbcUpsert.executeUpdates`
  * actually call are given behavior; everything else returns a
  * type-appropriate default.
  *
  * Supported SQL (regex-parsed — enough for the write paths under test):
  *   CREATE TABLE t (...), INSERT INTO t ("c",...) VALUES (?,...),
  *   UPDATE t SET c = ?, ... WHERE k = ? AND ..., SELECT ... WHERE 1=0
  *   (table-existence probes).
  *
  * All state is JVM-global (`local[*]` executors share the JVM), guarded
  * by `FakeDb.lock`. `events` records executeBatch sizes and commits in
  * order, so specs can assert batching cadence, not just final state.
  */
object FakeDb {

  final case class Table(cols: mutable.ArrayBuffer[String],
                         types: mutable.HashMap[String, Int],
                         rows: mutable.ArrayBuffer[mutable.HashMap[String, Any]])

  val tables: TrieMap[String, Table] = TrieMap.empty
  private val eventLog = mutable.ArrayBuffer.empty[String]
  private[fakejdbc] val lock = new Object

  def reset(): Unit = lock.synchronized {
    tables.clear(); eventLog.clear()
  }

  /** Create a table with JDBC column types (java.sql.Types constants) —
    * Spark's append path reads the table schema through the existence
    * probe's ResultSetMetaData, so types must be real.
    */
  def createTable(name: String, colsWithTypes: Seq[(String, Int)]): Unit =
    lock.synchronized {
      tables.put(name, Table(
        mutable.ArrayBuffer(colsWithTypes.map(_._1): _*),
        mutable.HashMap(colsWithTypes: _*),
        mutable.ArrayBuffer.empty))
    }

  private val ddlTypeNames: Seq[(String, Int)] = Seq(
    "BIGINT" -> java.sql.Types.BIGINT,
    "INTEGER" -> java.sql.Types.INTEGER,
    "DOUBLE" -> java.sql.Types.DOUBLE,
    "FLOAT" -> java.sql.Types.FLOAT,
    "TIMESTAMP" -> java.sql.Types.TIMESTAMP,
    "BOOLEAN" -> java.sql.Types.BOOLEAN,
    "BIT" -> java.sql.Types.BIT,
    "TEXT" -> java.sql.Types.VARCHAR,
    "VARCHAR" -> java.sql.Types.VARCHAR)

  def insertRow(name: String, values: Map[String, Any]): Unit =
    lock.synchronized {
      tables(name).rows += mutable.HashMap(values.toSeq: _*)
    }

  def rowsOf(name: String): Seq[Map[String, Any]] = lock.synchronized {
    tables(name).rows.map(_.toMap).toSeq
  }

  def events: Seq[String] = lock.synchronized(eventLog.toSeq)

  private[fakejdbc] def log(e: String): Unit = lock.synchronized(eventLog += e)

  private def stripQuote(s: String): String =
    s.trim.stripPrefix("\"").stripSuffix("\"").stripPrefix("`").stripSuffix("`")

  /** Apply one batched statement's rows to the store. */
  private[fakejdbc] def applyBatch(sql: String,
                                   batch: Seq[Seq[Any]]): Unit = {
    val insertRe =
      raw"(?is)\s*INSERT\s+INTO\s+(\S+)\s*\(([^)]*)\)\s*VALUES.*".r
    val updateRe =
      raw"(?is)\s*UPDATE\s+(\S+)\s+SET\s+(.*?)\s+WHERE\s+(.*)".r
    sql match {
      case insertRe(table, colList) =>
        val cols = colList.split(",").map(stripQuote).toSeq
        lock.synchronized {
          val t = tables.getOrElse(stripQuote(table),
            throw new SQLException(s"no such table: $table"))
          batch.foreach { vals =>
            t.rows += mutable.HashMap(cols.zip(vals): _*)
          }
          log(s"insertBatch:${stripQuote(table)}:${batch.size}")
        }
      case updateRe(table, setPart, wherePart) =>
        val setCols = setPart.split(",").map(_.split("=")(0)).map(stripQuote).toSeq
        val whereCols = wherePart.split("(?i)\\s+AND\\s+")
          .map(_.split("=")(0)).map(stripQuote).toSeq
        lock.synchronized {
          val t = tables.getOrElse(stripQuote(table),
            throw new SQLException(s"no such table: $table"))
          batch.foreach { vals =>
            val sets = setCols.zip(vals.take(setCols.size))
            val keys = whereCols.zip(vals.drop(setCols.size))
            t.rows.filter(r => keys.forall { case (k, v) => r.get(k).contains(v) })
              .foreach(r => sets.foreach { case (c, v) => r(c) = v })
          }
          log(s"updateBatch:${stripQuote(table)}:${batch.size}")
        }
      case other =>
        throw new SQLException(s"unsupported batched SQL: $other")
    }
  }

  private[fakejdbc] def executeDdl(sql: String): Unit = {
    val createRe = raw"(?is)\s*CREATE\s+TABLE\s+(\S+)\s*\((.*)\)\s*".r
    val dropRe = raw"(?is)\s*DROP\s+TABLE\s+(?:IF\s+EXISTS\s+)?(\S+)\s*".r
    val truncateRe = raw"(?is)\s*TRUNCATE\s+TABLE\s+(\S+)\s*".r
    // JdbcUpsert.mergeSql's exact shape: aliases t/s, equi-ON, matched
    // UPDATE SET of s-columns, not-matched INSERT of s-columns
    val mergeRe =
      raw"(?is)\s*MERGE\s+INTO\s+(\S+)\s+t\s+USING\s+(\S+)\s+s\s+ON\s+(.*?)\s*WHEN\s+MATCHED\s+THEN\s+UPDATE\s+SET\s+(.*?)\s*WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT\s*\(([^)]*)\)\s*VALUES\s*\(([^)]*)\)\s*".r
    // JdbcUpsert.upsertSql's Postgres grammar: INSERT … SELECT … FROM
    // staging ON CONFLICT (pk) DO UPDATE SET c = EXCLUDED.c
    val upsertRe =
      raw"(?is)\s*INSERT\s+INTO\s+(\S+)\s*\(([^)]*)\)\s*SELECT\s+.*?\s+FROM\s+(\S+)\s*ON\s+CONFLICT\s*\(([^)]*)\)\s*DO\s+UPDATE\s+SET\s+(.*)".r
    // JdbcUpsert.mysqlUpsertSql's grammar: INSERT … SELECT … FROM staging
    // ON DUPLICATE KEY UPDATE c = VALUES(c). MySQL matches on the target's
    // unique keys — modeled here as the insert columns NOT in the SET list
    // (which is exactly how mysqlUpsertSql partitions pk vs non-pk).
    val dupKeyRe =
      raw"(?is)\s*INSERT\s+INTO\s+(\S+)\s*\(([^)]*)\)\s*SELECT\s+.*?\s+FROM\s+(\S+)\s*ON\s+DUPLICATE\s+KEY\s+UPDATE\s+(.*)".r
    sql match {
      case createRe(table, colDefs) =>
        val cols = colDefs.split(",").map(_.trim).filter(_.nonEmpty).map { d =>
          val name = stripQuote(d.split("\\s+")(0))
          val typeStr = d.split("\\s+").drop(1).mkString(" ").toUpperCase
          val jdbcType = ddlTypeNames.collectFirst {
            case (kw, t) if typeStr.startsWith(kw) => t
          }.getOrElse(java.sql.Types.VARCHAR)
          name -> jdbcType
        }.toSeq
        createTable(stripQuote(table), cols)
      case dropRe(table) =>
        lock.synchronized { tables.remove(stripQuote(table)); () }
      case truncateRe(table) =>
        lock.synchronized {
          tables.get(stripQuote(table)).foreach(_.rows.clear())
        }
      case mergeRe(target, staging, onPart, setPart, insertCols, _) =>
        val pk = onPart.split("(?i)\\s+AND\\s+")
          .map(_.split("=")(0).trim.stripPrefix("t.")).map(stripQuote).toSeq
        val sets = setPart.split(",")
          .map(_.split("=")(0).trim.stripPrefix("t.")).map(stripQuote).toSeq
        val insCols = insertCols.split(",").map(stripQuote).toSeq
        lock.synchronized {
          val t = tables.getOrElse(stripQuote(target),
            throw new SQLException(s"no such table: $target"))
          val s = tables.getOrElse(stripQuote(staging),
            throw new SQLException(s"no such staging table: $staging"))
          var matched = 0
          var inserted = 0
          s.rows.foreach { srow =>
            val hits = t.rows.filter(r =>
              pk.forall(k => r.get(k) == srow.get(k)))
            if (hits.nonEmpty) {
              hits.foreach(r => sets.foreach(c => r(c) = srow.getOrElse(c, null)))
              matched += hits.size
            } else {
              t.rows += mutable.HashMap(
                insCols.map(c => c -> srow.getOrElse(c, null)): _*)
              inserted += 1
            }
          }
          log(s"merge:${stripQuote(target)}:upd=$matched:ins=$inserted")
        }
      case upsertRe(target, insertCols, staging, conflictCols, setPart) =>
        val pk = conflictCols.split(",").map(stripQuote).toSeq
        val sets = setPart.split(",")
          .map(_.split("=")(0).trim).map(stripQuote).toSeq
        val insCols = insertCols.split(",").map(stripQuote).toSeq
        lock.synchronized {
          val t = tables.getOrElse(stripQuote(target),
            throw new SQLException(s"no such table: $target"))
          val s = tables.getOrElse(stripQuote(staging),
            throw new SQLException(s"no such staging table: $staging"))
          var matched = 0
          var inserted = 0
          s.rows.foreach { srow =>
            val hits = t.rows.filter(r =>
              pk.forall(k => r.get(k) == srow.get(k)))
            if (hits.nonEmpty) {
              // EXCLUDED.<c> is the would-be-inserted row, i.e. srow
              hits.foreach(r => sets.foreach(c => r(c) = srow.getOrElse(c, null)))
              matched += hits.size
            } else {
              t.rows += mutable.HashMap(
                insCols.map(c => c -> srow.getOrElse(c, null)): _*)
              inserted += 1
            }
          }
          log(s"upsert:${stripQuote(target)}:upd=$matched:ins=$inserted")
        }
      case dupKeyRe(target, insertCols, staging, setPart) =>
        val insCols = insertCols.split(",").map(stripQuote).toSeq
        val sets = setPart.split(",")
          .map(_.split("=")(0).trim).map(stripQuote).toSeq
        val pk = insCols.filterNot(sets.contains)
        lock.synchronized {
          val t = tables.getOrElse(stripQuote(target),
            throw new SQLException(s"no such table: $target"))
          val s = tables.getOrElse(stripQuote(staging),
            throw new SQLException(s"no such staging table: $staging"))
          var matched = 0
          var inserted = 0
          s.rows.foreach { srow =>
            val hits = t.rows.filter(r =>
              pk.forall(k => r.get(k) == srow.get(k)))
            if (hits.nonEmpty) {
              // VALUES(<c>) is the would-be-inserted row, i.e. srow
              hits.foreach(r => sets.foreach(c => r(c) = srow.getOrElse(c, null)))
              matched += hits.size
            } else {
              t.rows += mutable.HashMap(
                insCols.map(c => c -> srow.getOrElse(c, null)): _*)
              inserted += 1
            }
          }
          log(s"dupkey:${stripQuote(target)}:upd=$matched:ins=$inserted")
        }
      case other => throw new SQLException(s"unsupported DDL: $other")
    }
  }

  /** Existence/schema probe: Spark's tableExists + getSchemaOption run
    * `SELECT ... FROM t WHERE 1=0` — an exception means "absent"; a result
    * set's metadata is read back as the table schema for append-mode
    * column resolution.
    */
  private[fakejdbc] def probeTable(sql: String): Table = {
    val fromRe = raw"(?is).*\bFROM\s+(\S+).*".r
    sql match {
      case fromRe(table) if tables.contains(stripQuote(table)) =>
        tables(stripQuote(table))
      // SQLState 42S02 = base table not found: Spark 4's tableExists only
      // maps a probe failure to "absent" when the dialect classifies the
      // SQLException as object-not-found — a stateless exception rethrows
      // and kills the create-if-missing write path
      case _ => throw new SQLException(s"no such table in: $sql", "42S02")
    }
  }

  // ------------------------------------------------------------ proxies

  private def typedDefault(rt: Class[_]): AnyRef = rt match {
    case java.lang.Boolean.TYPE => java.lang.Boolean.FALSE
    case java.lang.Integer.TYPE => Integer.valueOf(0)
    case java.lang.Long.TYPE => java.lang.Long.valueOf(0L)
    case java.lang.Short.TYPE => java.lang.Short.valueOf(0.toShort)
    case java.lang.Byte.TYPE => java.lang.Byte.valueOf(0.toByte)
    case java.lang.Double.TYPE => java.lang.Double.valueOf(0.0)
    case java.lang.Float.TYPE => java.lang.Float.valueOf(0.0f)
    case java.lang.Character.TYPE => java.lang.Character.valueOf(' ')
    case _ => null
  }

  private def proxy[T](iface: Class[T])(
      pf: PartialFunction[(String, Array[AnyRef]), AnyRef]): T =
    Proxy.newProxyInstance(iface.getClassLoader, Array(iface),
      new InvocationHandler {
        override def invoke(p: AnyRef, m: Method,
                            args: Array[AnyRef]): AnyRef = {
          val a = if (args == null) Array.empty[AnyRef] else args
          m.getName match {
            case "toString" if a.isEmpty => s"fake-${iface.getSimpleName}"
            case "hashCode" if a.isEmpty =>
              Integer.valueOf(System.identityHashCode(p))
            case "equals" if a.length == 1 =>
              java.lang.Boolean.valueOf(p eq a(0))
            case _ =>
              pf.applyOrElse((m.getName, a),
                (_: (String, Array[AnyRef])) => typedDefault(m.getReturnType))
          }
        }
      }).asInstanceOf[T]

  private val jdbcTypeNames: Map[Int, String] = Map(
    java.sql.Types.BIGINT -> "BIGINT", java.sql.Types.INTEGER -> "INTEGER",
    java.sql.Types.DOUBLE -> "DOUBLE", java.sql.Types.FLOAT -> "FLOAT",
    java.sql.Types.TIMESTAMP -> "TIMESTAMP",
    java.sql.Types.BOOLEAN -> "BOOLEAN", java.sql.Types.BIT -> "BIT",
    java.sql.Types.VARCHAR -> "VARCHAR")

  /** Zero-row result set whose metadata reflects the probed table's
    * columns — Spark's append path resolves insert columns against this.
    */
  private def schemaResultSet(t: Table): ResultSet = {
    def colAt(a: Array[AnyRef]): String =
      t.cols(a(0).asInstanceOf[Integer].intValue - 1)
    def typeAt(a: Array[AnyRef]): Int =
      t.types.getOrElse(colAt(a), java.sql.Types.VARCHAR)
    lazy val meta: ResultSetMetaData = proxy(classOf[ResultSetMetaData]) {
      case ("getColumnCount", _) => Integer.valueOf(t.cols.size)
      case ("getColumnName" | "getColumnLabel", a) => colAt(a)
      case ("getColumnType", a) => Integer.valueOf(typeAt(a))
      case ("getColumnTypeName", a) =>
        jdbcTypeNames.getOrElse(typeAt(a), "VARCHAR")
      case ("isSigned", _) => java.lang.Boolean.TRUE // BIGINT unsigned → Decimal(20,0)
      case ("isNullable", _) => Integer.valueOf(ResultSetMetaData.columnNullable)
      case ("getPrecision" | "getScale", _) => Integer.valueOf(0)
    }
    proxy(classOf[ResultSet]) {
      case ("next", _) => java.lang.Boolean.FALSE
      case ("getMetaData", _) => meta
      case ("isClosed", _) => java.lang.Boolean.FALSE
    }
  }

  private def metaData(conn: Connection): DatabaseMetaData =
    proxy(classOf[DatabaseMetaData]) {
      case (n, _) if n.startsWith("supports") => java.lang.Boolean.TRUE
      case ("getDatabaseProductName", _) => "graftmem"
      case ("getDatabaseProductVersion", _) => "1.0"
      case ("getDriverName", _) => "graftmem"
      case ("getDriverVersion", _) => "1.0"
      case ("getDatabaseMajorVersion", _) => Integer.valueOf(1)
      case ("getJDBCMajorVersion", _) => Integer.valueOf(4)
      case ("getConnection", _) => conn
      case ("getDefaultTransactionIsolation", _) =>
        Integer.valueOf(Connection.TRANSACTION_READ_COMMITTED)
    }

  private def statement(conn: Connection, sql: String): PreparedStatement = {
    val params = mutable.TreeMap.empty[Int, Any]
    val batch = mutable.ArrayBuffer.empty[Seq[Any]]
    def snapshot(): Seq[Any] = {
      require(params.nonEmpty, s"addBatch with no params for: $sql")
      val n = params.keys.max
      (1 to n).map(i => params.getOrElse(i, null))
    }
    proxy(classOf[PreparedStatement]) {
      case ("setNull", a) if a.length >= 2 =>
        params(a(0).asInstanceOf[Integer].intValue) = null; null
      case ("setQueryTimeout" | "setFetchSize" | "setMaxRows", _) => null
      case (n, a) if n.startsWith("set") && a.length == 2 &&
          a(0).isInstanceOf[Integer] =>
        params(a(0).asInstanceOf[Integer].intValue) = a(1); null
      case ("addBatch", a) if a.isEmpty =>
        batch += snapshot(); null
      case ("clearBatch", _) => batch.clear(); null
      case ("clearParameters", _) => params.clear(); null
      case ("executeBatch", _) =>
        val counts = Array.fill(batch.size)(1)
        applyBatch(sql, batch.toSeq)
        batch.clear()
        counts
      case ("executeUpdate", a) if a.isEmpty =>
        applyBatch(sql, Seq(snapshot())); Integer.valueOf(1)
      case ("executeUpdate", a) if a.length == 1 =>
        executeDdl(a(0).asInstanceOf[String]); Integer.valueOf(0)
      case ("executeQuery", a) if a.isEmpty =>
        schemaResultSet(probeTable(sql))
      case ("executeQuery", a) if a.length == 1 =>
        schemaResultSet(probeTable(a(0).asInstanceOf[String]))
      case ("getConnection", _) => conn
      case ("getWarnings", _) => null
      case ("isClosed", _) => java.lang.Boolean.FALSE
    }
  }

  private[fakejdbc] def newConnection(): Connection = {
    var autoCommit = true
    lazy val conn: Connection = proxy(classOf[Connection]) {
      case ("prepareStatement", a) if a.nonEmpty =>
        statement(conn, a(0).asInstanceOf[String])
      case ("createStatement", _) => statement(conn, null)
      case ("setAutoCommit", a) =>
        autoCommit = a(0).asInstanceOf[java.lang.Boolean].booleanValue; null
      case ("getAutoCommit", _) => java.lang.Boolean.valueOf(autoCommit)
      case ("commit", _) => log("commit"); null
      case ("rollback", _) => log("rollback"); null
      case ("getMetaData", _) => metaData(conn)
      case ("isClosed", _) => java.lang.Boolean.FALSE
      case ("isValid", _) => java.lang.Boolean.TRUE
      case ("getTransactionIsolation", _) =>
        Integer.valueOf(Connection.TRANSACTION_READ_COMMITTED)
    }
    conn
  }
}

/** Registered driver for `jdbc:graftmem:` URLs. `FakeDriver.ensureRegistered()`
  * is idempotent and must run before the first connection.
  */
final class FakeDriver extends java.sql.Driver {
  override def acceptsURL(url: String): Boolean =
    url != null && url.startsWith("jdbc:graftmem:")
  override def connect(url: String,
                       info: java.util.Properties): Connection =
    if (!acceptsURL(url)) null else FakeDb.newConnection()
  override def getMajorVersion: Int = 1
  override def getMinorVersion: Int = 0
  override def jdbcCompliant(): Boolean = false
  override def getPropertyInfo(url: String, info: java.util.Properties)
      : Array[java.sql.DriverPropertyInfo] = Array.empty
  override def getParentLogger: java.util.logging.Logger =
    java.util.logging.Logger.getGlobal
}

object FakeDriver {
  private lazy val doRegister: Boolean = {
    java.sql.DriverManager.registerDriver(new FakeDriver)
    true
  }
  def ensureRegistered(): Unit = { val _ = doRegister }
}
