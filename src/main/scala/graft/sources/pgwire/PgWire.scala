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
  *  - Simple Query for statements, plus (round 13) the Extended Query
  *    sub-protocol for SELECT streaming: Parse/Bind/Describe/Execute with
  *    a row cap against the unnamed portal, so a fetchsize-bounded read
  *    holds ≤ fetchSize rows in memory per round-trip — the reference's
  *    server-side-cursor semantic (`stream_results=True`,
  *    `/root/reference/src/floorist/floorist.py:128`) without pgjdbc.
  *    Like pgjdbc's cursor mode it requires an open transaction (Sync
  *    closes only the IMPLICIT transaction, so the suspended portal
  *    survives between Execute round-trips).
  *  - Authentication: trust, cleartext, md5, and (round 13)
  *    SCRAM-SHA-256 (RFC 5802/7677, the PostgreSQL 14+ default) —
  *    channel-binding variant SCRAM-SHA-256-PLUS is not offered since
  *    the client does not speak TLS.
  */
object PgWire {

  /** Send-failure drain: scan up to `maxHops` parting backend messages
    * for the buffered ErrorResponse — a terminated backend writes its
    * FATAL (57P01 etc.) and THEN closes, and those bytes usually sit in
    * the local receive buffer when a write fails. The parting bytes may
    * LEAD with a NoticeResponse ('N') or other chatter before the 'E':
    * a single-message peek would discard the buffered error behind it
    * and degrade the caller to the generic 08006, so non-'E' tags are
    * skipped. Returns null when no error is recoverable (read failure
    * or nothing but chatter). */
  private[pgwire] def drainPendingError(
      readMsg: () => (Byte, ByteBuffer),
      parse: ByteBuffer => PgServerException,
      maxHops: Int = 8): PgServerException = {
    var pending: PgServerException = null
    var hops = 0
    while (pending == null && hops < maxHops) {
      try {
        val (t, b) = readMsg()
        if (t.toChar == 'E') pending = parse(b)
      } catch { case _: Throwable => hops = maxHops }
      hops += 1
    }
    pending
  }

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

  /** SCRAM-SHA-256 client crypto (RFC 5802 §3, hash = SHA-256 per RFC
    * 7677), all from JDK primitives: PBKDF2WithHmacSHA256 for Hi(),
    * HmacSHA256, SHA-256. Usernames ride the startup message (the SCRAM
    * `n=` field is empty, as PostgreSQL specifies); passwords are used
    * as UTF-8 — SASLprep normalization is omitted, matching the ASCII
    * passwords any database config file can actually carry. */
  private[pgwire] object Scram {
    import javax.crypto.Mac
    import javax.crypto.SecretKeyFactory
    import javax.crypto.spec.{PBEKeySpec, SecretKeySpec}

    def hi(password: String, salt: Array[Byte], iterations: Int): Array[Byte] =
      SecretKeyFactory.getInstance("PBKDF2WithHmacSHA256")
        .generateSecret(new PBEKeySpec(password.toCharArray, salt, iterations, 256))
        .getEncoded

    def hmac(key: Array[Byte], msg: String): Array[Byte] = {
      val mac = Mac.getInstance("HmacSHA256")
      mac.init(new SecretKeySpec(key, "HmacSHA256"))
      mac.doFinal(msg.getBytes(UTF_8))
    }

    def sha256(bytes: Array[Byte]): Array[Byte] =
      MessageDigest.getInstance("SHA-256").digest(bytes)

    def xor(a: Array[Byte], b: Array[Byte]): Array[Byte] =
      a.zip(b).map { case (x, y) => (x ^ y).toByte }

    /** Parse `k1=v1,k2=v2,…` attribute lists (server-first/final). Values
      * may themselves contain '=' (base64 padding) — split on the FIRST
      * '=' only. */
    def attrs(msg: String): Map[Char, String] =
      msg.split(',').flatMap { part =>
        val i = part.indexOf('=')
        if (i < 1) None else Some(part.charAt(0) -> part.substring(i + 1))
      }.toMap
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

  /** Typed message: tag byte + int32 length (self-inclusive) + body. A
    * write failure means the connection dropped; before surfacing it,
    * drain the receive side for the server's parting FATAL (a terminated
    * backend sends 57P01 and THEN closes — those bytes usually sit in the
    * local buffer) so the caller gets the server's reason, not a raw
    * broken-pipe. Raw IOExceptions must never escape: the JDBC proxy may
    * only throw what the interface method declares. */
  private def send(tag: Byte, body: Array[Byte]): Unit = {
    try {
      out.writeByte(tag)
      out.writeInt(body.length + 4)
      out.write(body)
      out.flush()
    } catch {
      case e: java.io.IOException =>
        closed = true
        val pending = PgWire.drainPendingError(() => readMessage(), parseError)
        try socket.close() catch { case _: Throwable => () }
        if (pending != null) throw pending
        throw new SQLException("connection to server lost mid-request", "08006", e)
    }
  }

  private def readMessage(): (Byte, ByteBuffer) = {
    val tag = in.readByte()
    val len = in.readInt()
    if (len < 4 || len > (1 << 30)) throw new EOFException(s"bad message length $len")
    val body = new Array[Byte](len - 4)
    in.readFully(body)
    (tag, ByteBuffer.wrap(body))
  }

  /** Read the next backend message; on a dropped connection surface the
    * already-captured server error instead of a raw EOF — a FATAL
    * ErrorResponse (57P01 admin termination, crash recovery) is typically
    * the LAST thing the server sends before closing the socket, and it is
    * the message the caller (and the retry classifier) needs. With no
    * pending error: SQLSTATE 08006 connection_failure. */
  private def readOrFail(pending: PgServerException): (Byte, ByteBuffer) =
    try readMessage() catch {
      case e: java.io.IOException =>
        closed = true
        try socket.close() catch { case _: Throwable => () }
        if (pending != null) throw pending
        throw new SQLException("connection to server lost mid-response", "08006", e)
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

    // SCRAM conversation state, live only between auth codes 10 → 12.
    var scramFirstBare: String = null
    var scramServerSig: Array[Byte] = null
    def requiredPassword: String = password.getOrElse(
      throw new SQLException("server requires a password and none was given", "28P01"))

    var ready = false
    while (!ready) {
      val (tag, b) = readOrFail(null)
      tag.toChar match {
        case 'R' =>
          b.getInt match {
            case 0 => () // AuthenticationOk
            case 3 => // cleartext password
              send('p', cstring(requiredPassword))
            case 5 => // md5
              val salt = new Array[Byte](4); b.get(salt)
              send('p', cstring(PgWire.md5Password(user, requiredPassword, salt)))
            case 10 => // AuthenticationSASL: server's mechanism list
              val mechs = Iterator.continually(readCString(b))
                .takeWhile(_.nonEmpty).toSeq
              if (!mechs.contains("SCRAM-SHA-256"))
                throw new SQLException(
                  s"no common SASL mechanism (server offers ${mechs.mkString(", ")}; " +
                    "graft-pgwire speaks SCRAM-SHA-256 only — no TLS, so no -PLUS)", "28000")
              val _ = requiredPassword // fail fast before any wire bytes
              val nonceBytes = new Array[Byte](18)
              new java.security.SecureRandom().nextBytes(nonceBytes)
              val clientNonce = java.util.Base64.getEncoder.encodeToString(nonceBytes)
              // gs2 header "n,," = no channel binding, no authzid; the
              // username field is empty — PostgreSQL takes it from startup.
              scramFirstBare = s"n=,r=$clientNonce"
              val initial = ("n,," + scramFirstBare).getBytes(UTF_8)
              val lenBuf = ByteBuffer.allocate(4).putInt(initial.length).array()
              send('p', cstring("SCRAM-SHA-256") ++ lenBuf ++ initial)
            case 11 => // AuthenticationSASLContinue: server-first-message
              if (scramFirstBare == null)
                throw new SQLException("SASLContinue outside a SCRAM exchange", "28000")
              val serverFirst = new String(
                b.array(), b.position(), b.remaining(), UTF_8)
              val a = PgWire.Scram.attrs(serverFirst)
              val serverNonce = a.getOrElse('r',
                throw new SQLException("server-first-message missing nonce", "28000"))
              val clientNonce = scramFirstBare.substring(scramFirstBare.indexOf("r=") + 2)
              if (!serverNonce.startsWith(clientNonce))
                throw new SQLException(
                  "SCRAM server nonce does not extend the client nonce", "28000")
              val salt = java.util.Base64.getDecoder.decode(a('s'))
              val iterations = a('i').toInt
              val salted = PgWire.Scram.hi(requiredPassword, salt, iterations)
              val clientKey = PgWire.Scram.hmac(salted, "Client Key")
              val storedKey = PgWire.Scram.sha256(clientKey)
              // "biws" = base64("n,,") — the echoed gs2 header
              val withoutProof = s"c=biws,r=$serverNonce"
              val authMessage = s"$scramFirstBare,$serverFirst,$withoutProof"
              val proof = PgWire.Scram.xor(clientKey,
                PgWire.Scram.hmac(storedKey, authMessage))
              scramServerSig = PgWire.Scram.hmac(
                PgWire.Scram.hmac(salted, "Server Key"), authMessage)
              send('p', (withoutProof + ",p=" +
                java.util.Base64.getEncoder.encodeToString(proof)).getBytes(UTF_8))
            case 12 => // AuthenticationSASLFinal: v=ServerSignature
              val serverFinal = new String(
                b.array(), b.position(), b.remaining(), UTF_8)
              val v = PgWire.Scram.attrs(serverFinal).getOrElse('v',
                throw new SQLException("server-final-message missing signature", "28000"))
              // Verifying the signature authenticates the SERVER: only a
              // holder of the stored credentials can compute it. A MITM
              // that proxied our proof cannot forge this.
              if (scramServerSig == null || !java.security.MessageDigest.isEqual(
                  java.util.Base64.getDecoder.decode(v), scramServerSig))
                throw new SQLException(
                  "SCRAM server signature verification failed — server does " +
                    "not hold the credentials it authenticated against", "28000")
              scramFirstBare = null; scramServerSig = null
            case other =>
              throw new SQLException(
                s"authentication method $other not supported by graft-pgwire " +
                  "(trust/cleartext/md5/SCRAM-SHA-256)", "28000")
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
      val (tag, b) = readOrFail(error)
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

  // ---- extended query: portal streaming ---------------------------------

  /** Completed Execute round-trips across all portals — live-spec
    * telemetry proving a capped read really paged through the portal
    * instead of buffering one giant result. */
  @volatile var executeRoundTrips: Long = 0L

  private def i16(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def i32(v: Int): Array[Byte] =
    Array((v >>> 24).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  /** A suspended-resumable read over the UNNAMED portal: rows arrive in
    * `Execute(maxRows = fetchSize)` slices, so at most one slice is ever
    * in client memory — the wire half of the reference's
    * `stream_results=True` bounded-memory dump. One live portal per
    * connection (it IS the unnamed portal; a second `openPortal` would
    * destroy this one — enforced in [[PgWireSocket.openPortal]]). */
  final class Portal private[PgWireSocket] (val fields: Array[Field],
                                            fetchSize: Int) {
    private[PgWireSocket] var finished = false
    var commandTag: String = ""

    /** Fetch the next ≤ fetchSize rows; null when the portal is drained.
      * Each call is one Execute+Sync round-trip — Sync is safe because
      * the portal lives inside the caller's EXPLICIT transaction. */
    def nextBatch(): ArrayBuffer[Array[String]] = {
      if (finished) return null
      send('E', cstring("") ++ i32(fetchSize)) // Execute the unnamed portal
      send('S', Array.emptyByteArray)          // Sync
      executeRoundTrips += 1
      val rows = new ArrayBuffer[Array[String]](math.min(fetchSize, 1024))
      var error: PgServerException = null
      var done = false
      var suspended = false
      while (!done) {
        val (tag, b) = readOrFail(error)
        tag.toChar match {
          case 'D' =>
            val n = b.getShort.toInt
            rows += Array.tabulate(n) { _ =>
              val len = b.getInt
              if (len < 0) null
              else { val bytes = new Array[Byte](len); b.get(bytes); new String(bytes, UTF_8) }
            }
          case 's' => suspended = true // PortalSuspended: more rows remain
          case 'C' => commandTag = readCString(b); finished = true
          case 'I' => finished = true // EmptyQueryResponse
          case 'E' => if (error == null) error = parseError(b)
          case 'N' | 'S' | 'A' => ()
          case 'Z' => txnStatus = b.get().toChar; done = true
          case other =>
            throw new SQLException(s"unexpected message '$other' in Execute response")
        }
      }
      if (error != null) { finished = true; activePortal = null; throw error }
      if (finished) activePortal = null
      if (!suspended && !finished) {
        // zero-row slice without suspension cannot happen per protocol;
        // treat defensively as drained rather than spinning
        finished = true; activePortal = null
      }
      rows
    }

    /** Close an un-drained portal (early abandon): Close('P') + Sync. */
    def close(): Unit = if (!finished) {
      finished = true
      send('C', 'P'.toByte +: cstring(""))
      send('S', Array.emptyByteArray)
      var done = false
      var error: PgServerException = null
      while (!done) {
        val (tag, b) = readOrFail(error)
        tag.toChar match {
          case '3' => () // CloseComplete
          case 'E' => if (error == null) error = parseError(b)
          case 'Z' => txnStatus = b.get().toChar; done = true
          case _   => ()
        }
      }
      activePortal = null
      if (error != null) throw error
    }
  }

  private var activePortal: Portal = null

  /** Parse + Bind + Describe the unnamed statement/portal for `sql` and
    * return a [[Portal]] ready for its first `nextBatch()`. Requires an
    * OPEN transaction (`txnStatus != 'I'`): Sync ends an implicit
    * transaction and would destroy the suspended portal after every
    * slice — the same reason pgjdbc's cursor mode requires
    * `autoCommit=false`. */
  def openPortal(sql: String, fetchSize: Int): Portal = {
    if (closed) throw new SQLException("connection is closed", "08003")
    require(fetchSize > 0, s"fetchSize must be > 0, got $fetchSize")
    if (txnStatus == 'I')
      throw new SQLException(
        "portal streaming requires an open transaction (autoCommit off) — " +
          "a suspended portal does not survive Sync's implicit-transaction close", "25P01")
    if (activePortal != null && !activePortal.finished)
      throw new SQLException(
        "a portal is already open on this connection; drain or close it first", "55000")
    send('P', cstring("") ++ cstring(sql) ++ i16(0)) // Parse, no param types
    send('B', cstring("") ++ cstring("") ++ i16(0) ++ i16(0) ++ i16(0)) // Bind, all text
    send('D', 'P'.toByte +: cstring(""))             // Describe portal
    send('S', Array.emptyByteArray)                  // Sync
    var fields: Array[Field] = Array.empty
    var error: PgServerException = null
    var done = false
    while (!done) {
      val (tag, b) = readOrFail(error)
      tag.toChar match {
        case '1' | '2' => () // ParseComplete / BindComplete
        case 'T' =>
          val n = b.getShort.toInt
          fields = Array.tabulate(n) { _ =>
            val name = readCString(b)
            b.getInt; b.getShort
            val typeOid = b.getInt
            b.getShort
            val typmod = b.getInt
            b.getShort
            Field(name, typeOid, typmod)
          }
        case 'n' => () // NoData (row-less statement)
        case 'E' => if (error == null) error = parseError(b)
        case 'N' | 'S' | 'A' => ()
        case 'Z' => txnStatus = b.get().toChar; done = true
        case other =>
          throw new SQLException(s"unexpected message '$other' in Parse/Bind/Describe response")
      }
    }
    if (error != null) throw error
    val p = new Portal(fields, fetchSize)
    activePortal = p
    p
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
