package graft.sources.pgwire

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.sql.{Connection, Driver, DriverPropertyInfo, ResultSet, ResultSetMetaData, SQLException, SQLFeatureNotSupportedException, Types}
import java.util.Properties

import PgWire.{Field, Result}

/** JDBC facade over [[PgWireSocket]], built with reflection proxies.
  *
  * The JDBC interfaces total several hundred methods; a dump pipeline's
  * READ path touches a couple dozen (Spark's `JDBCRDD`: connect →
  * dialect `beforeFetch` → `sessionInitStatement` → `prepareStatement` →
  * `executeQuery` → typed getters → commit/close; schema resolution: the
  * same with a `WHERE 1=0` probe). Proxies implement exactly that surface
  * and throw `SQLFeatureNotSupportedException` naming any method outside
  * it — honest about scope instead of hundreds of silent stubs.
  *
  * Transaction semantics mirror pgjdbc's (public behavior the engine
  * already documents at [[graft.sources.SnapshotJdbcSource
  * .joinSnapshotStatement]]): with autoCommit off, a `BEGIN` is issued
  * lazily before the next statement, so a `sessionInitStatement` like
  * `SET TRANSACTION ISOLATION LEVEL REPEATABLE READ; SET TRANSACTION
  * SNAPSHOT '…'` lands inside the already-open transaction — the exact
  * ordering the exported-snapshot pinning depends on, now assertable
  * against a live server.
  */
object PgWireJdbc {

  def connect(host: String, port: Int, database: String, user: String,
              password: Option[String]): Connection = {
    val sock = new PgWireSocket(host, port, user, database, password)
    val handler = new ConnHandler(sock, s"//$host:$port/$database", user)
    val conn = proxy[Connection](handler)
    handler.setProxy(conn)
    conn
  }

  private def proxy[T](h: InvocationHandler)(implicit ct: scala.reflect.ClassTag[T]): T =
    Proxy.newProxyInstance(getClass.getClassLoader, Array(ct.runtimeClass), h)
      .asInstanceOf[T]

  /** Test-only telemetry access: the wire socket behind a pgwire
    * connection (e.g. its `executeRoundTrips` counter, which proves a
    * capped read really paged through a portal). */
  private[graft] def socketOf(conn: Connection): PgWireSocket =
    Proxy.getInvocationHandler(conn) match {
      case h: ConnHandler => h.socket
      case other => throw new IllegalArgumentException(
        s"not a graft-pgwire connection: $other")
    }

  private val NoArgs = new Array[AnyRef](0)

  private abstract class Handler(kind: String) extends InvocationHandler {
    final def invoke(p: AnyRef, m: Method, a: Array[AnyRef]): AnyRef = {
      val args = if (a == null) NoArgs else a
      m.getName match {
        case "toString"     => s"graft-pgwire $kind"
        case "hashCode"     => Int.box(System.identityHashCode(p))
        case "equals"       => Boolean.box(p eq args(0))
        case "isWrapperFor" => Boolean.box(false)
        case "unwrap"       => throw new SQLException(s"$kind is not a wrapper")
        case name =>
          try call(name, args)
          catch {
            // A proxy may only throw checked exceptions the interface
            // method declares; re-wrap for the few JDBC methods (e.g.
            // DatabaseMetaData.getDriverMajorVersion) that declare none.
            case e: SQLException if !m.getExceptionTypes.exists(
                _.isAssignableFrom(classOf[SQLException])) =>
              throw new RuntimeException(e.getMessage, e)
          }
      }
    }
    protected def call(name: String, args: Array[AnyRef]): AnyRef
    protected def unsupported(name: String): Nothing =
      throw new SQLFeatureNotSupportedException(
        s"graft-pgwire $kind.$name — outside the validated read surface")
  }

  // ---- Connection ---------------------------------------------------------

  private final class ConnHandler(sock: PgWireSocket, urlTail: String,
                                  user: String) extends Handler("Connection") {
    private var autoCommit = true
    private var isolation = Connection.TRANSACTION_READ_COMMITTED
    private var closed = false
    private var connProxy: Connection = _
    private[PgWireJdbc] def setProxy(c: Connection): Unit = connProxy = c
    private[PgWireJdbc] def proxyRef: Connection = connProxy

    /** Lazy BEGIN (pgjdbc's implicit-transaction behavior). */
    private[PgWireJdbc] def exec(sql: String): Vector[Result] = {
      if (closed) throw new SQLException("connection is closed", "08003")
      beginIfNeeded()
      sock.query(sql)
    }

    private[PgWireJdbc] def isAutoCommit: Boolean = autoCommit
    private[PgWireJdbc] def beginIfNeeded(): Unit =
      if (!autoCommit && sock.txnStatus == 'I') sock.query("BEGIN"): Unit
    private[PgWireJdbc] def socket: PgWireSocket = sock

    protected def call(name: String, args: Array[AnyRef]): AnyRef = name match {
      case "createStatement"  => stmtProxy(this, None)
      case "prepareStatement" => stmtProxy(this, Some(args(0).asInstanceOf[String]))
      case "setAutoCommit" =>
        val target = args(0).asInstanceOf[java.lang.Boolean].booleanValue
        if (autoCommit != target) {
          if (!autoCommit && sock.txnStatus != 'I') sock.query("COMMIT")
          autoCommit = target
        }
        null
      case "getAutoCommit" => Boolean.box(autoCommit)
      case "commit"   => if (sock.txnStatus != 'I') sock.query("COMMIT"); null
      case "rollback" => if (sock.txnStatus != 'I') sock.query("ROLLBACK"); null
      case "setTransactionIsolation" =>
        val lvl = args(0).asInstanceOf[java.lang.Integer].intValue
        val pgName = lvl match {
          case Connection.TRANSACTION_READ_UNCOMMITTED => "READ UNCOMMITTED"
          case Connection.TRANSACTION_READ_COMMITTED   => "READ COMMITTED"
          case Connection.TRANSACTION_REPEATABLE_READ  => "REPEATABLE READ"
          case Connection.TRANSACTION_SERIALIZABLE     => "SERIALIZABLE"
          case other => throw new SQLException(s"unknown isolation level $other")
        }
        sock.query(s"SET SESSION CHARACTERISTICS AS TRANSACTION ISOLATION LEVEL $pgName")
        isolation = lvl
        null
      case "getTransactionIsolation" => Int.box(isolation)
      case "close"    => if (!closed) { closed = true; sock.close() }; null
      case "isClosed" => Boolean.box(closed || sock.isClosed)
      case "isValid"  => Boolean.box(!closed && !sock.isClosed)
      case "getMetaData" =>
        proxy[java.sql.DatabaseMetaData](new DbMetaHandler(sock, urlTail, user, connProxy))
      case "getWarnings" | "getCatalog" | "getSchema" | "getClientInfo" => null
      case "clearWarnings" | "setReadOnly" | "setCatalog" | "setSchema" |
           "setClientInfo" | "setNetworkTimeout" | "setHoldability" => null
      case "isReadOnly"        => Boolean.box(false)
      case "getNetworkTimeout" => Int.box(0)
      case "getHoldability"    => Int.box(ResultSet.CLOSE_CURSORS_AT_COMMIT)
      case "nativeSQL"         => args(0)
      case "abort"             => call("close", NoArgs)
      case other               => unsupported(other)
    }
  }

  private def stmtProxy(conn: ConnHandler, preset: Option[String]): AnyRef =
    proxy[java.sql.PreparedStatement](new StmtHandler(conn, preset))

  // ---- Cursor: the unit RsHandler iterates ---------------------------------
  //
  // Two result deliveries share one ResultSet implementation: a Simple
  // Query's fully-buffered Result (one batch) and a suspended portal's
  // Execute slices (≤ fetchSize rows per batch, the bounded-memory path).

  private sealed trait Cursor {
    def fields: Array[Field]
    /** Next batch of rows; null once drained. Batches may be empty. */
    def nextBatch(): scala.collection.IndexedSeq[Array[String]]
    /** Release any server-side resource (idempotent). */
    def close(): Unit
  }

  /** A Simple Query result: everything already buffered, one batch. */
  private final class BufferedCursor(result: Result) extends Cursor {
    private var consumed = false
    def fields: Array[Field] = result.fields
    def nextBatch(): scala.collection.IndexedSeq[Array[String]] =
      if (consumed) null else { consumed = true; result.rows }
    def close(): Unit = consumed = true
  }

  /** A suspended-portal read: each batch is one Execute round-trip of
    * ≤ fetchSize rows. Closing an undrained cursor closes the portal on
    * the server (Close('P') + Sync) so the connection can open another —
    * mirroring pgjdbc's cursor cleanup; without it an abandoned read
    * (Spark task abort, a limit-stopped scan) wedges the connection with
    * "a portal is already open" (55000) until the transaction ends. */
  private final class PortalCursor(portal: PgWireSocket#Portal) extends Cursor {
    def fields: Array[Field] = portal.fields
    def nextBatch(): scala.collection.IndexedSeq[Array[String]] = portal.nextBatch()
    def close(): Unit = portal.close()
  }

  // ---- Statement / PreparedStatement --------------------------------------

  private final class StmtHandler(conn: ConnHandler, preset: Option[String])
      extends Handler("Statement") {
    private var closed = false
    private var fetchSize = 0
    private var lastResults: Vector[Result] = Vector.empty
    private var openCursor: Cursor = null

    private def sqlOf(args: Array[AnyRef]): String =
      preset.getOrElse(args(0).asInstanceOf[String])

    private def firstResultSet: AnyRef =
      lastResults.find(_.hasFields) match {
        case Some(r) => proxy[ResultSet](new RsHandler(new BufferedCursor(r)))
        case None    => null
      }

    protected def call(name: String, args: Array[AnyRef]): AnyRef = name match {
      case "executeQuery" =>
        // pgjdbc's cursor-mode condition verbatim: a positive fetchSize
        // with autoCommit off streams through a suspended portal
        // (Execute slices of ≤ fetchSize rows), so Spark's JDBCRDD read
        // with `fetchsize` set — the reference's `stream_results=True`
        // path — holds one slice in memory, not the result. Everything
        // else (schema probes, DDL, autocommit reads) stays Simple Query.
        if (fetchSize > 0 && !conn.isAutoCommit) {
          conn.beginIfNeeded()
          if (openCursor != null) { openCursor.close(); openCursor = null }
          lastResults = Vector.empty // statement accessors must not serve stale results
          val portal = conn.socket.openPortal(sqlOf(args), fetchSize)
          val cursor = new PortalCursor(portal)
          openCursor = cursor
          proxy[ResultSet](new RsHandler(cursor))
        } else {
          lastResults = conn.exec(sqlOf(args))
          val rs = firstResultSet
          if (rs == null)
            throw new SQLException(s"statement produced no result set")
          rs
        }
      case "execute" =>
        lastResults = conn.exec(sqlOf(args))
        Boolean.box(lastResults.exists(_.hasFields))
      case "executeUpdate" =>
        lastResults = conn.exec(sqlOf(args))
        // Command tag: "INSERT 0 5" / "UPDATE 3" / "DELETE 2" / "SELECT 4".
        val tag = lastResults.lastOption.map(_.tag).getOrElse("")
        Int.box(tag.split(' ').lastOption.flatMap(_.toIntOption).getOrElse(0))
      case "getResultSet"   => firstResultSet
      case "getUpdateCount" => Int.box(-1)
      case "getMoreResults" => Boolean.box(false)
      case "setFetchSize"   =>
        // Simple Query buffers each statement's rows fully; accepted (and
        // recorded) so Spark's fetchsize plumbing runs, but no cursor is
        // opened. Production streaming is pgjdbc's job.
        fetchSize = args(0).asInstanceOf[java.lang.Integer].intValue; null
      case "getFetchSize" => Int.box(fetchSize)
      case "setQueryTimeout" | "setMaxRows" | "cancel" | "clearWarnings" |
           "closeOnCompletion" | "setEscapeProcessing" | "setFetchDirection" |
           "setPoolable" => null
      case "getQueryTimeout" | "getMaxRows" => Int.box(0)
      case "getWarnings"   => null
      case "getConnection" => conn.proxyRef
      case "close" =>
        closed = true
        if (openCursor != null) { openCursor.close(); openCursor = null }
        null
      case "isClosed" => Boolean.box(closed)
      case other      => unsupported(other)
    }
  }

  // ---- ResultSet -----------------------------------------------------------

  private final class RsHandler(cursor: Cursor) extends Handler("ResultSet") {
    private val fields = cursor.fields
    private var batch: scala.collection.IndexedSeq[Array[String]] = null
    private var idx = -1      // position within the current batch
    private var rowNum = 0    // 1-based absolute row number (getRow)
    private var onRow = false
    private var lastWasNull = false
    private var closed = false

    private def columnIndex(arg: AnyRef): Int = arg match {
      case n: java.lang.Integer => n.intValue
      case label: String =>
        val i = fields.indexWhere(_.name.equalsIgnoreCase(label))
        if (i < 0) throw new SQLException(s"no such column '$label'")
        i + 1
      case other => throw new SQLException(s"bad column selector $other")
    }

    private def raw(args: Array[AnyRef]): String = {
      if (!onRow) throw new SQLException("ResultSet cursor is not on a row")
      val v = batch(idx)(columnIndex(args(0)) - 1)
      lastWasNull = v == null
      v
    }

    protected def call(name: String, args: Array[AnyRef]): AnyRef = name match {
      case "next" =>
        if (closed) throw new SQLException("ResultSet is closed", "24000")
        idx += 1
        onRow = batch != null && idx < batch.length
        // advance across batch boundaries; a portal may legally hand back
        // an empty final slice, so loop rather than test once
        while (!onRow) {
          batch = cursor.nextBatch()
          if (batch == null) return Boolean.box(false) // drained, off-row
          idx = 0
          onRow = idx < batch.length
        }
        rowNum += 1
        Boolean.box(true)
      case "getString" => raw(args)
      case "getInt"    => val v = raw(args); Int.box(if (v == null) 0 else v.trim.toInt)
      case "getLong"   => val v = raw(args); Long.box(if (v == null) 0L else v.trim.toLong)
      case "getShort"  => val v = raw(args); Short.box(if (v == null) 0 else v.trim.toShort)
      case "getByte"   => val v = raw(args); Byte.box(if (v == null) 0 else v.trim.toByte)
      case "getDouble" => val v = raw(args); Double.box(if (v == null) 0d else v.trim.toDouble)
      case "getFloat"  => val v = raw(args); Float.box(if (v == null) 0f else v.trim.toFloat)
      case "getBoolean" =>
        val v = raw(args)
        Boolean.box(v != null && (v == "t" || v == "true" || v == "1"))
      case "getBigDecimal" =>
        val v = raw(args); if (v == null) null else new java.math.BigDecimal(v.trim)
      case "getDate" =>
        val v = raw(args); if (v == null) null else PgText.parseDate(v)
      case "getTimestamp" =>
        val v = raw(args); if (v == null) null else PgText.parseTimestamp(v)
      case "getBytes" =>
        val v = raw(args); if (v == null) null else PgText.parseBytea(v)
      case "getObject" =>
        val ci = columnIndex(args(0))
        val v = raw(args)
        if (v == null) null
        else fields(ci - 1).typeOid match {
          case PgOid.Bool => Boolean.box(v == "t")
          case PgOid.Int2 => Short.box(v.toShort)
          case PgOid.Int4 => Int.box(v.toInt)
          case PgOid.Int8 => Long.box(v.toLong)
          case PgOid.Float4 => Float.box(v.toFloat)
          case PgOid.Float8 => Double.box(v.toDouble)
          case PgOid.Numeric => new java.math.BigDecimal(v)
          case PgOid.Date => PgText.parseDate(v)
          case PgOid.Timestamp | PgOid.TimestampTz => PgText.parseTimestamp(v)
          case PgOid.Bytea => PgText.parseBytea(v)
          case _ => v
        }
      case "wasNull"    => Boolean.box(lastWasNull)
      case "findColumn" => Int.box(columnIndex(args(0)))
      case "getMetaData" =>
        proxy[ResultSetMetaData](new RsMetaHandler(fields))
      case "close" =>
        // Closing an undrained portal cursor releases the server-side
        // portal (Close('P')+Sync) so the connection stays usable.
        if (!closed) { closed = true; onRow = false; cursor.close() }
        null
      case "isClosed" => Boolean.box(closed)
      case "getWarnings" => null
      case "clearWarnings" | "setFetchSize" | "setFetchDirection" => null
      case "getType"        => Int.box(ResultSet.TYPE_FORWARD_ONLY)
      case "getConcurrency" => Int.box(ResultSet.CONCUR_READ_ONLY)
      case "getFetchSize"   => Int.box(0)
      case "getRow"         => Int.box(rowNum)
      case "getHoldability" => Int.box(ResultSet.CLOSE_CURSORS_AT_COMMIT)
      case other            => unsupported(other)
    }
  }

  // ---- ResultSetMetaData ----------------------------------------------------

  private final class RsMetaHandler(fields: Array[Field])
      extends Handler("ResultSetMetaData") {
    private def f(args: Array[AnyRef]): Field =
      fields(args(0).asInstanceOf[java.lang.Integer].intValue - 1)

    protected def call(name: String, args: Array[AnyRef]): AnyRef = name match {
      case "getColumnCount"                  => Int.box(fields.length)
      case "getColumnLabel" | "getColumnName" => f(args).name
      case "getColumnType"     => Int.box(PgOid.jdbcType(f(args).typeOid))
      case "getColumnTypeName" => PgOid.pgTypeName(f(args).typeOid)
      case "getPrecision" =>
        val fld = f(args)
        Int.box(fld.typeOid match {
          case PgOid.Numeric if fld.typmod >= 4 => (fld.typmod - 4) >> 16
          case PgOid.Varchar | PgOid.Bpchar if fld.typmod >= 4 => fld.typmod - 4
          case _ => 0
        })
      case "getScale" =>
        val fld = f(args)
        Int.box(fld.typeOid match {
          case PgOid.Numeric if fld.typmod >= 4 => (fld.typmod - 4) & 0xffff
          case _ => 0
        })
      case "isSigned" =>
        Boolean.box(PgOid.numericOids.contains(f(args).typeOid))
      case "isNullable"    => Int.box(ResultSetMetaData.columnNullable)
      case "isCaseSensitive" | "isSearchable" | "isReadOnly" => Boolean.box(true)
      case "isCurrency" | "isAutoIncrement" | "isWritable" |
           "isDefinitelyWritable" => Boolean.box(false)
      case "getColumnDisplaySize" => Int.box(0)
      case "getCatalogName" | "getSchemaName" | "getTableName" => ""
      case "getColumnClassName" => PgOid.javaClassName(f(args).typeOid)
      case other => unsupported(other)
    }
  }

  // ---- DatabaseMetaData -------------------------------------------------------

  private final class DbMetaHandler(sock: PgWireSocket, urlTail: String,
                                    user: String, conn: Connection)
      extends Handler("DatabaseMetaData") {
    private def serverVersion: String =
      sock.parameters.getOrElse("server_version", "0.0")

    protected def call(name: String, args: Array[AnyRef]): AnyRef = name match {
      case "getURL"                    => s"jdbc:postgresql:$urlTail"
      case "getUserName"               => user
      case "getDatabaseProductName"    => "PostgreSQL"
      case "getDatabaseProductVersion" => serverVersion
      case "getDatabaseMajorVersion" =>
        Int.box(serverVersion.takeWhile(_.isDigit).toIntOption.getOrElse(0))
      case "getDatabaseMinorVersion" =>
        Int.box(serverVersion.dropWhile(_ != '.').drop(1)
          .takeWhile(_.isDigit).toIntOption.getOrElse(0))
      case "getDriverName"         => "graft-pgwire"
      case "getDriverVersion"      => "0.1"
      case "getDriverMajorVersion" => Int.box(0)
      case "getDriverMinorVersion" => Int.box(1)
      case "getJDBCMajorVersion" => Int.box(4)
      case "getJDBCMinorVersion" => Int.box(2)
      case "getConnection"       => conn
      case "supportsTransactions" => Boolean.box(true)
      case "getIdentifierQuoteString" => "\""
      case other => unsupported(other)
    }
  }
}

/** Text-format value decoding (PostgreSQL's documented output formats). */
private[graft] object PgText {

  def parseDate(v: String): java.sql.Date = java.sql.Date.valueOf(v.trim)

  /** ISO DateStyle: `2024-01-02 03:04:05.123456` with an optional UTC
    * offset suffix (`+00`, `-05:30`, …) for timestamptz. The startup
    * message pins `TimeZone=UTC`, so the offset is normally `+00`. */
  def parseTimestamp(v: String): java.sql.Timestamp = {
    val s = v.trim
    // Offset sign can only appear after the time part (index >= 19 in ISO).
    val offAt = s.indexWhere(c => c == '+' || c == '-', 19)
    if (offAt < 0) java.sql.Timestamp.valueOf(s)
    else {
      val base = java.time.LocalDateTime.parse(s.substring(0, offAt).replace(' ', 'T'))
      val rawOff = s.substring(offAt)
      val off = java.time.ZoneOffset.of(rawOff match {
        case o if o.length == 3 => o + ":00"      // "+00"
        case o if o.length == 5 && !o.contains(":") => o.take(3) + ":" + o.drop(3)
        case o => o
      })
      java.sql.Timestamp.from(base.atOffset(off).toInstant)
    }
  }

  /** `bytea` hex output format (`\x48656c6c6f`, the server default since
    * PostgreSQL 9.0). */
  def parseBytea(v: String): Array[Byte] = {
    require(v.startsWith("\\x"), s"unsupported bytea output format: ${v.take(8)}…")
    val hex = v.substring(2)
    val out = new Array[Byte](hex.length / 2)
    var i = 0
    while (i < out.length) {
      out(i) = ((Character.digit(hex.charAt(2 * i), 16) << 4) |
        Character.digit(hex.charAt(2 * i + 1), 16)).toByte
      i += 1
    }
    out
  }
}

/** Static type-oid knowledge (`pg_type.dat` assignments, stable across
  * releases — same public source the reference cites for uuid's 2950 at
  * `floorist.py:27-29`). */
private[pgwire] object PgOid {
  val Bool = 16; val Bytea = 17; val Int8 = 20; val Int2 = 21; val Int4 = 23
  val Text = 25; val Json = 114; val Float4 = 700; val Float8 = 701
  val Inet = 869; val Bpchar = 1042; val Varchar = 1043; val Date = 1082
  val Time = 1083; val Timestamp = 1114; val TimestampTz = 1184
  val Numeric = 1700; val Uuid = 2950; val Jsonb = 3802

  val numericOids: Set[Int] = Set(Int2, Int4, Int8, Float4, Float8, Numeric)

  /** pgjdbc-compatible `java.sql.Types` mapping (notably: timestamptz is
    * reported as TIMESTAMP and uuid as OTHER — the shapes
    * [[graft.sources.GraftPostgresDialect]] expects). */
  def jdbcType(oid: Int): Int = oid match {
    case Bool => Types.BOOLEAN
    case Bytea => Types.BINARY
    case Int8 => Types.BIGINT
    case Int2 => Types.SMALLINT
    case Int4 => Types.INTEGER
    case Text | Varchar => Types.VARCHAR
    case Bpchar => Types.CHAR
    case Float4 => Types.REAL
    case Float8 => Types.DOUBLE
    case Date => Types.DATE
    case Time => Types.TIME
    case Timestamp | TimestampTz => Types.TIMESTAMP
    case Numeric => Types.NUMERIC
    case _ => Types.OTHER
  }

  def pgTypeName(oid: Int): String = oid match {
    case Bool => "bool"
    case Bytea => "bytea"
    case Int8 => "int8"
    case Int2 => "int2"
    case Int4 => "int4"
    case Text => "text"
    case Json => "json"
    case Float4 => "float4"
    case Float8 => "float8"
    case Inet => "inet"
    case Bpchar => "bpchar"
    case Varchar => "varchar"
    case Date => "date"
    case Time => "time"
    case Timestamp => "timestamp"
    case TimestampTz => "timestamptz"
    case Numeric => "numeric"
    case Uuid => "uuid"
    case Jsonb => "jsonb"
    case other => s"oid$other"
  }

  def javaClassName(oid: Int): String = oid match {
    case Bool => "java.lang.Boolean"
    case Int2 => "java.lang.Short"
    case Int4 => "java.lang.Integer"
    case Int8 => "java.lang.Long"
    case Float4 => "java.lang.Float"
    case Float8 => "java.lang.Double"
    case Numeric => "java.math.BigDecimal"
    case Date => "java.sql.Date"
    case Timestamp | TimestampTz => "java.sql.Timestamp"
    case Bytea => "[B"
    case _ => "java.lang.String"
  }
}

/** The JDBC `Driver` Spark instantiates via the `driver` option (Spark's
  * `DriverRegistry` reflectively constructs the class and wraps it) and
  * that `DriverManager` callers reach after [[PgWireDriver.ensureRegistered]].
  * Accepts standard `jdbc:postgresql://host[:port]/db` URLs so the engine's
  * URL scheme — and [[graft.sources.GraftPostgresDialect]]'s `canHandle` —
  * stay identical whether pgjdbc or this shim is on the classpath. */
final class PgWireDriver extends Driver {

  override def acceptsURL(url: String): Boolean =
    url != null && url.startsWith("jdbc:postgresql://")

  override def connect(url: String, info: Properties): Connection = {
    if (!acceptsURL(url)) return null // JDBC contract: defer to other drivers
    val (host, port, db) = PgWireDriver.parseUrl(url)
    val user = Option(info.getProperty("user")).filter(_.nonEmpty)
      .getOrElse(throw new SQLException("pgwire: 'user' property is required", "28000"))
    val password = Option(info.getProperty("password")).filter(_.nonEmpty)
    PgWireJdbc.connect(host, port, db, user, password)
  }

  override def getMajorVersion: Int = 0
  override def getMinorVersion: Int = 1
  override def jdbcCompliant(): Boolean = false
  override def getPropertyInfo(url: String, info: Properties): Array[DriverPropertyInfo] =
    Array.empty
  override def getParentLogger: java.util.logging.Logger =
    throw new SQLFeatureNotSupportedException("pgwire has no java.util.logging logger")
}

object PgWireDriver {
  val ClassName: String = classOf[PgWireDriver].getName

  @volatile private var registered = false

  /** Idempotent `DriverManager` registration for direct
    * `DriverManager.getConnection` callers ([[graft.sources
    * .SnapshotJdbcSource.pin]]); Spark's option-driven path constructs the
    * class itself and does not need this. */
  def ensureRegistered(): Unit = synchronized {
    if (!registered) {
      java.sql.DriverManager.registerDriver(new PgWireDriver)
      registered = true
    }
  }

  /** `jdbc:postgresql://host[:port]/db[?opts]` → (host, port, db). */
  private[graft] def parseUrl(url: String): (String, Int, String) = {
    val tail = url.stripPrefix("jdbc:postgresql://")
    val slash = tail.indexOf('/')
    require(slash > 0, s"malformed postgres JDBC url: $url")
    val hostPort = tail.substring(0, slash)
    val db = tail.substring(slash + 1).takeWhile(_ != '?')
    require(db.nonEmpty, s"malformed postgres JDBC url (no database): $url")
    val (host, port) = hostPort.lastIndexOf(':') match {
      case -1 => (hostPort, 5432)
      case i  => (hostPort.substring(0, i), hostPort.substring(i + 1).toInt)
    }
    (host, port, db)
  }
}
