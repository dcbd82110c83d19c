package graft.sources.pgwire

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, EOFException}
import java.net.{InetSocketAddress, Socket}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import java.sql.SQLException

import scala.collection.mutable.ArrayBuffer

/** Minimal PostgreSQL frontend/backend ("v3") wire-protocol client.
  *
  * Everything here is implemented from the PUBLIC protocol specification
  * (PostgreSQL docs, "Frontend/Backend Protocol") — startup + trust/
  * cleartext/md5 authentication, the Simple Query sub-protocol, and text-
  * format result decoding. Why it exists: the engine's Postgres read path
  * (`JdbcSource`/`SnapshotJdbcSource` over Spark's JDBC datasource, the
  * analogue of the reference's SQLAlchemy source at
  * `/root/reference/src/floorist/floorist.py:123-152`) could previously be
  * exercised only against embedded Derby, because the offline build
  * environment ships a live PostgreSQL server binary but no pgjdbc jar.
  * This client plus the reflection-proxy JDBC shim in [[PgWireJdbc]] close
  * that gap: the REAL Spark JDBC scan, the uuid OID-2950 decode, exported-
  * snapshot pinning and the retry classifier all run against a real
  * Postgres in `PgLiveSpec`.
  *
  * Scope is deliberately semantics-validation, not a pgjdbc replacement:
  *  - Simple Query only (text results, each statement's rows fully
  *    buffered). Bounded-memory streaming via portals/`Execute` is left to
  *    pgjdbc, which production deployments put on the classpath —
  *    [[graft.core.JdbcDrivers]] prefers it whenever present.
  *  - SCRAM authentication is not implemented (the managed test server
  *    runs `--auth=trust`); trust, cleartext and md5 are.
  */
object PgWire {

  /** One column of a RowDescription ('T') message. */
  final case class Field(name: String, typeOid: Int, typmod: Int)

  /** One statement's result: fields are empty for row-less commands.
    * Values are the wire text form; SQL NULL is `null`. */
  final class Result(val fields: Array[Field]) {
    val rows = new ArrayBuffer[Array[String]]()
    var tag: String = ""
    def hasFields: Boolean = fields.nonEmpty
  }

  /** Server `ErrorResponse` surfaced as a JDBC exception. The message is
    * rendered psycopg2/SQLAlchemy-style — `(pgwire.SerializationFailure)
    * ERROR: could not serialize …` — because the reference's retry
    * classifier (`floorist.py:31-63`) matches `str(ex)` substrings that in
    * Python come from SQLAlchemy prefixing the DBAPI error CLASS NAME,
    * which psycopg2 generates from the SQLSTATE condition name (a public
    * mapping: PostgreSQL docs Appendix A). Rendering the same condition
    * name keeps [[graft.core.RetryPolicy]] exactly as portable as the
    * reference's classifier against a live server. */
  final class PgServerException(val severity: String, val sqlState: String,
                                val serverMessage: String)
      extends SQLException(
        PgWire.conditionName(sqlState)
          .map(c => s"(pgwire.$c) $severity: $serverMessage")
          .getOrElse(s"$severity: $serverMessage [SQLSTATE $sqlState]"),
        sqlState)

  /** SQLSTATE → PostgreSQL condition name (PascalCased as psycopg2 does),
    * for the states a dump pipeline meets. Unlisted states render with the
    * raw SQLSTATE instead — never wrongly classified, just less pretty. */
  private[graft] def conditionName(sqlState: String): Option[String] =
    sqlState match {
      case "40001" => Some("SerializationFailure")
      case "40P01" => Some("DeadlockDetected")
      case "57014" => Some("QueryCanceled")
      case "55P03" => Some("LockNotAvailable")
      case "23505" => Some("UniqueViolation")
      case "42601" => Some("SyntaxError")
      case "42P01" => Some("UndefinedTable")
      case "28P01" => Some("InvalidPassword")
      case "25P02" => Some("InFailedSqlTransaction")
      case _       => None
    }

  private[graft] def md5Hex(bytes: Array[Byte]): String =
    MessageDigest.getInstance("MD5").digest(bytes)
      .map(b => f"${b & 0xff}%02x").mkString

  /** pgjdbc/libpq md5 scheme: `"md5" + md5(md5(password + user) + salt)`. */
  private[graft] def md5Password(user: String, password: String,
                                  salt: Array[Byte]): String = {
    val inner = md5Hex((password + user).getBytes(UTF_8))
    "md5" + md5Hex(inner.getBytes(UTF_8) ++ salt)
  }
}

/** A single authenticated backend connection speaking Simple Query. Not
  * thread-safe — mirrors a JDBC Connection's single-threaded contract. */
final class PgWireSocket(host: String, port: Int, user: String,
                         database: String, password: Option[String],
                         connectTimeoutMs: Int = 10000,
                         socketTimeoutMs: Int = 600000) extends AutoCloseable {
  import PgWire._

  private val socket = new Socket()
  socket.connect(new InetSocketAddress(host, port), connectTimeoutMs)
  socket.setSoTimeout(socketTimeoutMs)
  socket.setTcpNoDelay(true)
  private val in = new DataInputStream(new BufferedInputStream(socket.getInputStream, 64 * 1024))
  private val out = new DataOutputStream(new BufferedOutputStream(socket.getOutputStream, 64 * 1024))

  /** Backend ParameterStatus values (server_version, TimeZone, …). */
  val parameters = scala.collection.mutable.Map.empty[String, String]

  /** Last ReadyForQuery transaction status: 'I' idle, 'T' in txn,
    * 'E' failed txn. */
  @volatile var txnStatus: Char = 'I'

  private var closed = false

  startup()

  // ---- wire primitives -------------------------------------------------

  private def cstring(s: String): Array[Byte] = s.getBytes(UTF_8) :+ 0.toByte

  /** Typed message: tag byte + int32 length (self-inclusive) + body. */
  private def send(tag: Byte, body: Array[Byte]): Unit = {
    out.writeByte(tag)
    out.writeInt(body.length + 4)
    out.write(body)
    out.flush()
  }

  private def readMessage(): (Byte, ByteBuffer) = {
    val tag = in.readByte()
    val len = in.readInt()
    if (len < 4 || len > (1 << 30)) throw new EOFException(s"bad message length $len")
    val body = new Array[Byte](len - 4)
    in.readFully(body)
    (tag, ByteBuffer.wrap(body))
  }

  private def readCString(b: ByteBuffer): String = {
    var c = b.get()
    val start = b.position() - 1
    var n = 0
    while (c != 0) { n += 1; c = b.get() }
    new String(b.array(), start, n, UTF_8)
  }

  private def parseError(b: ByteBuffer): PgServerException = {
    var severity = "ERROR"; var state = "XX000"; var message = "unknown error"
    var code = b.get()
    while (code != 0) {
      val value = readCString(b)
      code.toChar match {
        case 'S' => severity = value
        case 'C' => state = value
        case 'M' => message = value
        case _   => ()
      }
      code = b.get()
    }
    new PgServerException(severity, state, message)
  }

  // ---- startup + auth ---------------------------------------------------

  private def startup(): Unit = {
    // StartupMessage is untagged: int32 len, int32 protocol 3.0, k\0v\0…\0.
    val params = Seq(
      "user" -> user, "database" -> database,
      "client_encoding" -> "UTF8", "DateStyle" -> "ISO", "TimeZone" -> "UTC",
      "application_name" -> "graft-pgwire")
    val body = Array(0, 3, 0, 0).map(_.toByte) ++
      params.flatMap { case (k, v) => cstring(k) ++ cstring(v) } :+ 0.toByte
    out.writeInt(body.length + 4)
    out.write(body)
    out.flush()

    var ready = false
    while (!ready) {
      val (tag, b) = readMessage()
      tag.toChar match {
        case 'R' =>
          b.getInt match {
            case 0 => () // AuthenticationOk
            case 3 => // cleartext password
              send('p', cstring(password.getOrElse(
                throw new SQLException("server requires a password and none was given", "28P01"))))
            case 5 => // md5
              val salt = new Array[Byte](4); b.get(salt)
              send('p', cstring(PgWire.md5Password(user, password.getOrElse(
                throw new SQLException("server requires a password and none was given", "28P01")), salt)))
            case other =>
              throw new SQLException(
                s"authentication method $other not supported by graft-pgwire " +
                  "(trust/cleartext/md5 only; use pgjdbc for SCRAM)", "28000")
          }
        case 'S' => parameters(readCString(b)) = readCString(b)
        case 'K' => () // BackendKeyData — cancel keys unused
        case 'N' => () // NoticeResponse
        case 'E' => throw parseError(b)
        case 'Z' => txnStatus = b.get().toChar; ready = true
        case other =>
          throw new SQLException(s"unexpected message '$other' during startup")
      }
    }
  }

  // ---- simple query -----------------------------------------------------

  /** Run one Simple Query ('Q') — possibly multiple `;`-separated
    * statements, one [[PgWire.Result]] each, in order. Errors are thrown
    * AFTER the protocol resyncs on ReadyForQuery, so the connection stays
    * usable (matching libpq). */
  def query(sql: String): Vector[Result] = {
    if (closed) throw new SQLException("connection is closed", "08003")
    send('Q', cstring(sql))
    val results = Vector.newBuilder[Result]
    var current: Result = null
    var error: PgServerException = null
    var done = false
    while (!done) {
      val (tag, b) = readMessage()
      tag.toChar match {
        case 'T' =>
          val n = b.getShort.toInt
          val fields = Array.tabulate(n) { _ =>
            val name = readCString(b)
            b.getInt // table oid
            b.getShort // attnum
            val typeOid = b.getInt
            b.getShort // typlen
            val typmod = b.getInt
            b.getShort // format (0 = text in simple query)
            Field(name, typeOid, typmod)
          }
          current = new Result(fields)
          results += current
        case 'D' =>
          val n = b.getShort.toInt
          val row = Array.tabulate(n) { _ =>
            val len = b.getInt
            if (len < 0) null
            else {
              val bytes = new Array[Byte](len)
              b.get(bytes)
              new String(bytes, UTF_8)
            }
          }
          if (current != null) current.rows += row
        case 'C' =>
          val tagText = readCString(b)
          if (current == null) {
            current = new Result(Array.empty)
            results += current
          }
          current.tag = tagText
          current = null
        case 'I' => // EmptyQueryResponse
          current = null
        case 'E' =>
          if (error == null) error = parseError(b)
        case 'N' | 'S' | 'A' => () // notices / parameter changes / notifies
        case 'G' | 'H' | 'W' =>
          throw new SQLException("COPY sub-protocol is not supported by graft-pgwire")
        case 'Z' =>
          txnStatus = b.get().toChar
          done = true
        case other =>
          throw new SQLException(s"unexpected message '$other' in query response")
      }
    }
    if (error != null) throw error
    results.result()
  }

  def isClosed: Boolean = closed

  override def close(): Unit = if (!closed) {
    closed = true
    try {
      out.writeByte('X'); out.writeInt(4); out.flush() // Terminate
    } catch { case _: Throwable => () }
    try socket.close() catch { case _: Throwable => () }
  }
}
