package graft

import java.sql.{Connection, DriverManager, SQLException}

import org.scalatest.BeforeAndAfterAll

import graft.core.{DumpExecutor, EngineConfig, FloorplanRow, JdbcConfig, RetryPolicy}
import graft.sink.{FileContract, PartitionedParquetSink}
import graft.sources.{JdbcSource, SnapshotJdbcSource}
import graft.sources.pgwire.PgWireDriver

/** LIVE PostgreSQL integration — the suite the reference runs against its
  * docker-compose Postgres (`reference tests/test_floorist.py:160-220`),
  * here against a [[PgTestServer]]-managed local instance reached through
  * the in-repo pgwire JDBC shim (the offline sandbox has the server but no
  * pgjdbc jar; see [[graft.sources.JdbcDrivers]]).
  *
  * What is now exercised against REAL Postgres semantics instead of Derby
  * stand-ins: the uuid OID-2950 → string decode through the registered
  * dialect, `pg_export_snapshot()`/`SET TRANSACTION SNAPSHOT` pinning
  * across partitioned Spark JDBC reads (including the statement-ordering
  * fix and the dialect's `beforeFetch` autoCommit handling), a genuine
  * 40001 serialization failure flowing through [[RetryPolicy]], and the
  * full Floorista floorplan→parquet dump.
  *
  * Every test `cancel`s (not fails) when the host cannot run Postgres, so
  * the suite is environment-gated exactly like the S3A settings.
  */
class PgLiveSpec extends SparkSpecBase with BeforeAndAfterAll {

  private var liveState: Either[String, PgTestServer.Live] = Left("not started")

  private def live: PgTestServer.Live = liveState match {
    case Right(l)     => l
    case Left(reason) => cancel(s"live Postgres unavailable: $reason")
  }

  private def jdbcConfig: JdbcConfig =
    JdbcConfig(live.host, live.port, live.database, live.user, "")

  private def connect(): Connection = {
    PgWireDriver.ensureRegistered()
    val props = new java.util.Properties()
    props.setProperty("user", live.user)
    DriverManager.getConnection(live.jdbcUrl, props)
  }

  override def beforeAll(): Unit = {
    super.beforeAll()
    liveState = PgTestServer.start()
    liveState.foreach { _ =>
      val c = connect()
      try {
        val st = c.createStatement()
        st.execute(
          """CREATE TABLE hosts (
            |  id uuid PRIMARY KEY,
            |  account int4 NOT NULL,
            |  display_name text,
            |  cpu_count int2,
            |  mem_bytes int8,
            |  ratio float8,
            |  cost numeric(10,2),
            |  active bool,
            |  created date,
            |  updated timestamptz,
            |  payload bytea
            |)""".stripMargin)
        st.execute(
          """INSERT INTO hosts
            |SELECT md5('host-' || i)::uuid, i % 7, 'host_' || i,
            |       (i % 64)::int2, (i::int8) * 1048576, i / 7.0,
            |       (i * 1.25)::numeric(10,2), i % 2 = 0,
            |       DATE '2024-01-01' + (i % 365),
            |       TIMESTAMPTZ '2024-06-01 12:00:00+00' + (i || ' hours')::interval,
            |       decode(md5(i::text), 'hex')
            |FROM generate_series(1, 207) i""".stripMargin)
        st.execute("INSERT INTO hosts (id, account) VALUES (md5('null-row')::uuid, 3)")
        st.execute("CREATE TABLE counter (k int PRIMARY KEY, v int NOT NULL)")
        st.execute("INSERT INTO counter VALUES (1, 100)")
        st.close()
      } finally c.close()
    }
  }

  override def afterAll(): Unit = {
    liveState.foreach(PgTestServer.stop)
    super.afterAll()
  }

  // --- wire-level ---------------------------------------------------------

  test("live: uuid's type oid is 2950, as the dialect assumes") {
    val c = connect()
    try {
      val rs = c.createStatement()
        .executeQuery("SELECT oid FROM pg_type WHERE typname = 'uuid'")
      assert(rs.next() && rs.getInt(1) == 2950)
    } finally c.close()
  }

  test("live: typed getters round-trip every dump-relevant type") {
    val c = connect()
    try {
      val rs = c.createStatement().executeQuery(
        "SELECT id, account, display_name, cpu_count, mem_bytes, ratio, cost, " +
          "active, created, updated, payload FROM hosts WHERE display_name = 'host_8'")
      assert(rs.next())
      assert(rs.getString(1).matches("[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}"))
      assert(rs.getInt(2) == 1) // 8 % 7
      assert(rs.getString(3) == "host_8")
      assert(rs.getShort(4) == 8)
      assert(rs.getLong(5) == 8L * 1048576)
      assert(math.abs(rs.getDouble(6) - 8 / 7.0) < 1e-12)
      assert(rs.getBigDecimal(7) == new java.math.BigDecimal("10.00"))
      assert(rs.getBoolean(8))
      assert(rs.getDate(9).toLocalDate == java.time.LocalDate.of(2024, 1, 9))
      assert(rs.getTimestamp(10).toInstant ==
        java.time.Instant.parse("2024-06-01T20:00:00Z"))
      assert(rs.getBytes(11).length == 16)
      assert(!rs.next())

      val nulls = c.createStatement().executeQuery(
        "SELECT display_name, cost FROM hosts WHERE display_name IS NULL")
      assert(nulls.next())
      assert(nulls.getString(1) == null && nulls.wasNull())
      assert(nulls.getBigDecimal(2) == null && nulls.wasNull())
    } finally c.close()
  }

  // --- the real Spark JDBC scan --------------------------------------------

  test("live: JdbcSource.read decodes uuid as STRING via the dialect (OID 2950)") {
    val df = JdbcSource.read(spark, jdbcConfig,
      "SELECT id, account, display_name, cost, active, created, updated FROM hosts")
    val s = df.schema
    assert(s("id").dataType.typeName == "string")
    assert(s("cost").dataType.typeName == "decimal(10,2)")
    assert(s("updated").dataType.typeName == "timestamp")
    assert(df.count() == 208)
    val row8 = df.where("display_name = 'host_8'").collect().head
    assert(row8.getString(0).length == 36)
    assert(row8.getInt(1) == 1)
  }

  test("live: partitioned read equals the single-partition read") {
    val single = JdbcSource.read(spark, jdbcConfig,
      "SELECT id, account, display_name FROM hosts")
    val parted = JdbcSource.read(spark, jdbcConfig,
      "SELECT id, account, display_name FROM hosts",
      partitioning = Some(("account", 0L, 7L, 4)))
    assert(parted.rdd.getNumPartitions == 4)
    assert(parted.count() == 208)
    assert(single.exceptAll(parted).isEmpty && parted.exceptAll(single).isEmpty)
  }

  test("live: exported-snapshot pinning isolates concurrent commits " +
    "across partitioned reads") {
    val props = Map("user" -> live.user)
    val sql = "SELECT id, account FROM hosts"
    val part = Some(("account", 0L, 7L, 3))
    SnapshotJdbcSource.withPinnedSnapshot(live.jdbcUrl, props) { snap =>
      assert(snap.snapshotId.nonEmpty)
      val before = SnapshotJdbcSource
        .readPinned(spark, jdbcConfig, sql, snap, partitioning = part).count()
      assert(before == 208)

      // A concurrent writer commits 50 more rows mid-dump.
      val w = connect()
      try w.createStatement().execute(
        """INSERT INTO hosts (id, account, display_name)
          |SELECT md5('late-' || i)::uuid, i % 7, 'late_' || i
          |FROM generate_series(1, 50) i""".stripMargin)
      finally w.close()

      // Unpinned sees them; every pinned partition still sees the snapshot.
      assert(JdbcSource.read(spark, jdbcConfig, sql).count() == 258)
      val pinnedAgain = SnapshotJdbcSource
        .readPinned(spark, jdbcConfig, sql, snap, partitioning = part).count()
      assert(pinnedAgain == 208,
        "a partitioned read after a concurrent commit must still see the pinned snapshot")
    }
    // Anchor released: the snapshot is gone, the new rows are visible.
    assert(JdbcSource.read(spark, jdbcConfig, sql).count() == 258)
  }

  // --- retry classification against a genuine server error ------------------

  test("live: a real 40001 serialization failure classifies as retryable") {
    val c1 = connect(); val c2 = connect()
    try {
      for (c <- Seq(c1, c2)) {
        c.setAutoCommit(false)
        c.setTransactionIsolation(Connection.TRANSACTION_REPEATABLE_READ)
      }
      // Both take their snapshot, then both update the same row.
      c1.createStatement().executeQuery("SELECT v FROM counter WHERE k = 1").next()
      c2.createStatement().executeQuery("SELECT v FROM counter WHERE k = 1").next()
      c1.createStatement().execute("UPDATE counter SET v = v + 1 WHERE k = 1")
      c1.commit()
      val ex = intercept[SQLException] {
        c2.createStatement().execute("UPDATE counter SET v = v + 10 WHERE k = 1")
      }
      assert(ex.getSQLState == "40001", s"expected 40001, got $ex")
      assert(ex.getMessage.contains("SerializationFailure"),
        "the psycopg2-style condition-name rendering the classifier matches on")
      assert(RetryPolicy.isRetryable(ex))
      assert(RetryPolicy.evaluate(ex, attempt = 0) == RetryPolicy.Retry)
      // And through Spark's usual wrapping.
      assert(RetryPolicy.isRetryable(new RuntimeException("job aborted", ex)))
      c2.rollback()
    } finally { c1.close(); c2.close() }
  }

  test("live: md5 and cleartext password authentication round-trip") {
    // Configure two password-auth'd roles and hba rules AHEAD of the
    // blanket trust rule (first match wins), then reload.
    val c = connect()
    try {
      val st = c.createStatement()
      st.execute("SET password_encryption = 'md5'; " +
        "CREATE ROLE md5user LOGIN PASSWORD 'sekret'")
      st.execute("RESET password_encryption; " +
        "CREATE ROLE pwuser LOGIN PASSWORD 'clearpw'") // scram-stored
      val hba = new java.io.File(live.dataRoot, "data/pg_hba.conf").toPath
      val rules =
        "host all md5user 127.0.0.1/32 md5\n" +
          "host all pwuser 127.0.0.1/32 password\n"
      java.nio.file.Files.write(hba,
        (rules + new String(java.nio.file.Files.readAllBytes(hba), "UTF-8"))
          .getBytes("UTF-8"))
      assert(st.executeQuery("SELECT pg_reload_conf()").next())
    } finally c.close()

    def auth(user: String, password: String): Connection = {
      val props = new java.util.Properties()
      props.setProperty("user", user)
      props.setProperty("password", password)
      DriverManager.getConnection(
        s"jdbc:postgresql://${live.host}:${live.port}/${live.database}", props)
    }
    // md5 challenge–response (auth code 5): the double-md5 construction.
    val m = auth("md5user", "sekret")
    try assert(m.createStatement().executeQuery("SELECT 41 + 1").next())
    finally m.close()
    // cleartext (auth code 3) against a scram-STORED credential — the
    // server hashes and compares, the wire carries the plain password.
    val p = auth("pwuser", "clearpw")
    try assert(p.createStatement().executeQuery("SELECT 1").next())
    finally p.close()
    // Wrong password fails with the auth SQLSTATE, not a hang.
    val bad = intercept[SQLException] { auth("md5user", "wrong") }
    assert(bad.getSQLState == "28P01", s"got $bad")
  }

  // --- portal streaming (the reference's bounded-memory cursor) -------------

  test("live: portal streaming pages a large result in fetchSize slices") {
    val c = connect()
    try {
      c.setAutoCommit(false)
      val sock = graft.sources.pgwire.PgWireJdbc.socketOf(c)
      val before = sock.executeRoundTrips
      val st = c.createStatement()
      st.setFetchSize(40)
      val rs = st.executeQuery("SELECT i FROM generate_series(1, 207) i")
      var n = 0; var sum = 0L
      while (rs.next()) { n += 1; sum += rs.getLong(1) }
      assert(n == 207 && sum == 207L * 208 / 2)
      val trips = sock.executeRoundTrips - before
      // 207 rows at ≤40/slice: 5 suspended slices + the final partial = 6.
      assert(trips >= 6,
        s"207 rows / fetchSize 40 must take ≥6 Execute round-trips, got $trips " +
          "— the read buffered instead of streaming")
      rs.close(); st.close(); c.commit()
    } finally c.close()
  }

  test("live: a 200k-row result pages through 200 Execute round-trips") {
    // The r12 'Done' criterion for bounded-memory streaming: a LARGE
    // result crosses the wire in fetchSize slices — the PortalCursor holds
    // exactly one ≤1000-row batch at a time by construction, so ≥200
    // round-trips on 200k rows IS the bounded-heap property, asserted
    // from protocol telemetry rather than a flaky heap probe.
    val c = connect()
    try {
      c.setAutoCommit(false)
      val sock = graft.sources.pgwire.PgWireJdbc.socketOf(c)
      val before = sock.executeRoundTrips
      val st = c.createStatement()
      st.setFetchSize(1000)
      val rs = st.executeQuery(
        "SELECT i, md5(i::text) AS h FROM generate_series(1, 200000) i")
      var n = 0L; var sum = 0L
      while (rs.next()) { n += 1; sum += rs.getLong(1) }
      assert(n == 200000L && sum == 200000L * 200001 / 2)
      val trips = sock.executeRoundTrips - before
      assert(trips >= 200, s"expected >= 200 round-trips, got $trips")
      rs.close(); st.close(); c.commit()
    } finally c.close()
  }

  test("live: an abandoned portal is closed so the connection stays usable") {
    val c = connect()
    try {
      c.setAutoCommit(false)
      val st = c.createStatement()
      st.setFetchSize(10)
      val rs = st.executeQuery("SELECT i FROM generate_series(1, 1000) i")
      assert(rs.next() && rs.getLong(1) == 1L) // take one row, abandon the rest
      rs.close() // must Close('P') the suspended portal, not just flag
      // Without the cleanup this throws 55000 "a portal is already open".
      val rs2 = st.executeQuery("SELECT 7")
      assert(rs2.next() && rs2.getInt(1) == 7 && !rs2.next())
      rs2.close(); c.commit()
    } finally c.close()
  }

  test("live: a Spark JDBC read with fetchsize streams through portals") {
    // Spark's Postgres dialect `beforeFetch` turns autoCommit off whenever
    // fetchsize > 0, so the executor read path IS the portal path — the
    // engine-level reproduction of the reference's `stream_results=True`
    // (`/root/reference/src/floorist/floorist.py:128`). Correctness across
    // slice boundaries: 208 rows at fetchSize 50 → 5 slices (order-proof
    // source: other tests in this suite grow the hosts table).
    val df = JdbcSource.read(spark, jdbcConfig,
      "SELECT i, md5(i::text) AS h FROM generate_series(1, 208) i", fetchSize = 50)
    assert(df.count() == 208)
    assert(df.select("h").distinct().count() == 208)
  }

  test("live: a backend killed mid-portal surfaces the FATAL, not a raw EOF") {
    // The server's last act before closing the socket is a FATAL
    // ErrorResponse (57P01, "terminating connection due to administrator
    // command"); the wire client must hand the CALLER that message — a
    // raw EOFException would lose the one fact the operator needs. And
    // reference-faithfully, a connection drop is NOT retryable
    // (floorist.py:31-63 lists no connection substrings).
    val victim = connect(); val admin = connect()
    try {
      victim.setAutoCommit(false)
      val st = victim.createStatement()
      st.setFetchSize(10)
      val rs = st.executeQuery(
        "SELECT i, pg_backend_pid() AS pid FROM generate_series(1, 10000) i")
      assert(rs.next())
      val pid = rs.getInt(2)
      val term = admin.createStatement()
        .executeQuery(s"SELECT pg_terminate_backend($pid)")
      assert(term.next() && term.getBoolean(1))
      Thread.sleep(300) // let the FATAL land
      val ex = intercept[SQLException] {
        var more = true
        while (more) more = rs.next() // crosses a slice boundary -> Execute
      }
      assert(ex.getSQLState == "57P01" || ex.getSQLState == "08006",
        s"expected the FATAL's 57P01 (or 08006 if the socket died first), got $ex")
      assert(RetryPolicy.evaluate(ex, attempt = 0) == RetryPolicy.Failure,
        "connection drops are not retryable in the reference's classifier")
      assert(victim.isClosed || !victim.isValid(1),
        "the connection must report itself dead after the drop")
    } finally { try victim.close() catch { case _: Throwable => () }; admin.close() }
  }

  test("live: SCRAM-SHA-256 authentication round-trips (the PG14+ default)") {
    val c = connect()
    try {
      val st = c.createStatement()
      st.execute("CREATE ROLE scramuser LOGIN PASSWORD 'scr4m-pw'")
      // PostgreSQL 14+ stores SCRAM verifiers by default; pin the premise.
      val rs = st.executeQuery(
        "SELECT rolpassword FROM pg_authid WHERE rolname = 'scramuser'")
      assert(rs.next() && rs.getString(1).startsWith("SCRAM-SHA-256$"),
        "expected a scram-stored verifier (server password_encryption default)")
      val hba = new java.io.File(live.dataRoot, "data/pg_hba.conf").toPath
      java.nio.file.Files.write(hba,
        ("host all scramuser 127.0.0.1/32 scram-sha-256\n" +
          new String(java.nio.file.Files.readAllBytes(hba), "UTF-8"))
          .getBytes("UTF-8"))
      assert(st.executeQuery("SELECT pg_reload_conf()").next())
    } finally c.close()

    def auth(password: String): Connection = {
      val props = new java.util.Properties()
      props.setProperty("user", "scramuser")
      props.setProperty("password", password)
      DriverManager.getConnection(live.jdbcUrl, props)
    }
    // Full RFC 7677 exchange incl. server-signature verification (auth
    // codes 10 → 11 → 12) against a genuinely scram-enforcing hba rule.
    val s = auth("scr4m-pw")
    try {
      val rs = s.createStatement().executeQuery("SELECT current_user")
      assert(rs.next() && rs.getString(1) == "scramuser")
    } finally s.close()
    // Wrong password: the server rejects the client proof with 28P01.
    val bad = intercept[SQLException] { auth("wrong-pw") }
    assert(bad.getSQLState == "28P01", s"got $bad")
  }

  // --- full pipeline ---------------------------------------------------------

  test("live: Floorista dumps a floorplan from Postgres to chunked parquet") {
    val out = tmpDir("pglive-dump")
    val total = JdbcSource.read(spark, jdbcConfig, "SELECT id FROM hosts").count()
    val fp = new java.io.File(out, "floorplan.yaml")
    val yaml =
      s"""- prefix: dumps/hosts
         |  query: SELECT id, account, display_name, cost FROM hosts
         |  chunksize: 100
         |- prefix: dumps/none
         |  query: SELECT id FROM hosts WHERE account = 99
         |""".stripMargin
    java.nio.file.Files.write(fp.toPath, yaml.getBytes("UTF-8"))
    java.nio.file.Files.createDirectories(new java.io.File(out, "bucket").toPath)

    val config = EngineConfig(
      bucketUrl = s"file://$out/bucket",
      endpoint = None, region = None, accessKeyId = None, secretAccessKey = None,
      floorplanFile = fp.getAbsolutePath,
      jdbc = Some(jdbcConfig),
      fileContract = FileContract.Exact)
    assert(new core.Floorista(spark, config).run() == 0)

    val date = java.time.LocalDate.now()
    val dated = s"year_created=${date.getYear}/month_created=${date.getMonthValue}" +
      s"/day_created=${date.getDayOfMonth}"
    val hostsDir = new java.io.File(s"$out/bucket/dumps/hosts/$dated")
    val parts = hostsDir.listFiles().filter(_.getName.startsWith("part-"))
    assert(parts.length == math.ceil(total / 100.0).toInt,
      s"Exact contract: ceil($total/100) gzip chunks")
    val back = spark.read.parquet(hostsDir.getAbsolutePath)
    assert(back.count() == total)
    assert(back.schema("id").dataType.typeName == "string")

    val noneDir = new java.io.File(s"$out/bucket/dumps/none/$dated")
    assert(noneDir.isDirectory, "empty dump leaves the folder marker")
    assert(noneDir.listFiles().forall(f => !f.getName.startsWith("part-")))
  }

  test("live: a floorplan partition block dumps in parallel under one snapshot") {
    val out = tmpDir("pglive-par")
    val total = JdbcSource.read(spark, jdbcConfig, "SELECT id FROM hosts").count()
    val fp = new java.io.File(out, "floorplan.yaml")
    // The reference-format superset: same dump, three range partitions.
    val yaml =
      s"""- prefix: par/hosts
         |  query: SELECT id, account, display_name FROM hosts
         |  chunksize: 0
         |  partition_column: account
         |  partition_lower: 0
         |  partition_upper: 7
         |  partitions: 3
         |""".stripMargin
    java.nio.file.Files.write(fp.toPath, yaml.getBytes("UTF-8"))
    java.nio.file.Files.createDirectories(new java.io.File(out, "bucket").toPath)

    // Plumbing check first: the parsed block reaches the pinned read as a
    // genuinely partitioned scan.
    val row = core.FloorplanParser.toRow(
      core.FloorplanParser.parseFile(fp.getAbsolutePath).head)
    assert(row.partitioning.contains(("account", 0L, 7L, 3)))
    SnapshotJdbcSource.withPinnedSnapshot(live.jdbcUrl, Map("user" -> live.user)) { snap =>
      val pinned = SnapshotJdbcSource.readPinned(spark, jdbcConfig, row.query,
        snap, partitioning = row.partitioning)
      assert(pinned.rdd.getNumPartitions == 3)
      assert(pinned.count() == total)
    }

    // Then the full pipeline through the same floorplan.
    val config = EngineConfig(
      bucketUrl = s"file://$out/bucket",
      endpoint = None, region = None, accessKeyId = None, secretAccessKey = None,
      floorplanFile = fp.getAbsolutePath,
      jdbc = Some(jdbcConfig),
      fileContract = FileContract.Exact)
    assert(new core.Floorista(spark, config).run() == 0)
    val back = spark.read.parquet(
      s"$out/bucket/par/hosts/year_created=*/month_created=*/day_created=*")
    assert(back.count() == total)
    assert(back.select("id").distinct().count() == total)
  }

  test("live: DumpExecutor + pinned-attempt scope writes through a snapshot") {
    val out = tmpDir("pglive-exec")
    val sink = new PartitionedParquetSink(spark, s"file://$out", FileContract.Exact)
    val executor = new DumpExecutor(sink,
      runQuery = sql => JdbcSource.read(spark, jdbcConfig, sql),
      attemptScope = SnapshotJdbcSource.dumpAttemptScope(spark, jdbcConfig))
    val row = FloorplanRow("exec/hosts",
      "SELECT id, account FROM hosts WHERE account = 2", Some(0))
    assert(executor.execute(row, dumpNo = 1))
    val files = new java.io.File(out, "exec/hosts")
    assert(files.isDirectory)
    val back = spark.read.parquet(
      s"$out/exec/hosts/year_created=*/month_created=*/day_created=*")
    assert(back.count() ==
      JdbcSource.read(spark, jdbcConfig,
        "SELECT id FROM hosts WHERE account = 2").count())
  }
}
