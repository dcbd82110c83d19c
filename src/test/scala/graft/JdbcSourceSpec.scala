package graft

import org.apache.spark.sql.functions._

import graft.sources.{JdbcSource, SnapshotJdbcSource}

/** Live round-trip of the JDBC read path against embedded Derby (no
  * Postgres exists in this sandbox; the reference e2e-tests the same
  * surface against a real database, `reference tests/test_floorist.py:
  * 212-220`). What this exercises: option wiring (url/driver/query/
  * fetchsize), the customSchema string-mapping used for uuid columns, and
  * bounded partitioned reads. The Postgres-specific pieces (dialect,
  * OID mapping) are covered by GraftPostgresDialectSpec. */
class JdbcSourceSpec extends SparkSpecBase {

  private val url = "jdbc:derby:memory:graftdb;create=true"
  private val driver = "org.apache.derby.iapi.jdbc.AutoloadedDriver"

  private def seedTable(): Unit = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.execute("DROP TABLE items") catch { case _: java.sql.SQLException => }
      st.execute("CREATE TABLE items (id INT NOT NULL, name VARCHAR(20), qty INT)")
      (1 to 20).foreach(i =>
        st.execute(s"INSERT INTO items VALUES ($i, 'item_$i', ${i * 10})"))
      st.close()
    } finally conn.close()
  }

  test("single-partition read round-trips rows (reference snapshot semantics)") {
    seedTable()
    val df = JdbcSource.readUrl(spark, url, driver, Map.empty,
      "SELECT id, name, qty FROM items", fetchSize = 5)
    assert(df.rdd.getNumPartitions == 1,
      "default must be one partition = one transaction snapshot")
    val rows = df.orderBy("id").collect()
    assert(rows.length == 20)
    assert(rows.head.getString(1) == "item_1")
  }

  test("customSchema string-mapping applies (the uuid-column treatment)") {
    seedTable()
    // Derby folds unquoted identifiers to upper case, like Postgres folds
    // to lower — the mapping targets whatever the database reports.
    val df = JdbcSource.readUrl(spark, url, driver, Map.empty,
      "SELECT id, name FROM items", stringColumns = Seq("ID"))
    assert(df.schema("ID").dataType.typeName == "string")
    assert(df.count() == 20)
  }

  test("predicates push into the JDBC scan (A2 pushdown proof)") {
    seedTable()
    // Data fidelity alone doesn't prove the database sees the WHERE — a
    // post-scan Spark filter returns the same rows while shipping the
    // whole table. Assert the predicate lands in the scan's pushed
    // filters, the way GroupTopKSpec asserts its plan shape.
    val df = JdbcSource.readUrl(spark, url, driver, Map.empty,
        "SELECT id, name, qty FROM items")
      .filter(col("ID") > 10)
    val scans = df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.RowDataSourceScanExec => s
    }
    assert(scans.nonEmpty, "expected a RowDataSourceScanExec JDBC scan, got:\n" +
      df.queryExecution.executedPlan.toString)
    val pushed = scans.head.metadata.getOrElse("PushedFilters", "")
    assert(pushed.contains("GreaterThan(ID,10)"),
      s"filter did not reach the JDBC source; PushedFilters: $pushed")
    assert(df.count() == 10)
  }

  test("partitioned read splits work without losing or duplicating rows") {
    seedTable()
    val df = JdbcSource.readUrl(spark, url, driver, Map.empty,
      "SELECT id, qty FROM items", partitioning = Some(("ID", 1L, 20L, 4)))
    assert(df.rdd.getNumPartitions == 4)
    assert(df.agg(sum("QTY")).head.getLong(0) == (1 to 20).map(_ * 10).sum)
    assert(df.select("ID").distinct().count() == 20)
  }

  test("sessionInit runs on EVERY partition's data connection before the query") {
    seedTable()
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.execute("DROP TABLE init_log") catch { case _: java.sql.SQLException => }
      st.execute("CREATE TABLE init_log (hit INT)")
      st.close()
    } finally conn.close()
    val df = JdbcSource.readUrl(spark, url, driver, Map.empty,
      "SELECT id, qty FROM items", partitioning = Some(("ID", 1L, 20L, 4)),
      sessionInit = Some("INSERT INTO init_log VALUES (1)"))
    assert(df.count() == 20)
    val check = java.sql.DriverManager.getConnection(url)
    try {
      val rs = check.createStatement()
        .executeQuery("SELECT count(*) FROM init_log")
      rs.next()
      // One init per data connection: >= one per partition (the snapshot
      // join statement must reach every split, or a retried task would
      // silently read a different snapshot).
      assert(rs.getInt(1) >= 4, s"init ran ${rs.getInt(1)} times, expected >= 4")
    } finally check.close()
  }

  test("PinnedSnapshot: anchor holds a REPEATABLE READ txn open until close()") {
    seedTable()
    val snap = SnapshotJdbcSource.pin(url, Map.empty,
      snapshotQuery = "VALUES 'derby-fake-snapshot'")
    try {
      assert(snap.snapshotId == "derby-fake-snapshot")
      assert(!snap.anchor.isClosed, "anchor must stay open while pinned")
      assert(!snap.anchor.getAutoCommit, "anchor must be in a transaction")
      assert(snap.anchor.getTransactionIsolation ==
        java.sql.Connection.TRANSACTION_REPEATABLE_READ)
    } finally snap.close()
    assert(snap.anchor.isClosed, "close() must release the anchor")
  }

  test("withPinnedSnapshot releases the anchor even when the body throws") {
    seedTable()
    var captured: SnapshotJdbcSource.PinnedSnapshot = null
    intercept[RuntimeException] {
      SnapshotJdbcSource.withPinnedSnapshot(url, Map.empty,
        snapshotQuery = "VALUES 'x'") { s =>
        captured = s
        throw new RuntimeException("dump failed")
      }
    }
    assert(captured != null && captured.anchor.isClosed)
  }

  test("joinSnapshotStatement escapes quotes and targets REPEATABLE READ") {
    seedTable()
    val snap = SnapshotJdbcSource.pin(url, Map.empty,
      snapshotQuery = "VALUES 'id''with-quote'")
    try {
      val stmt = SnapshotJdbcSource.joinSnapshotStatement(snap)
      assert(stmt.contains("ISOLATION LEVEL REPEATABLE READ"))
      // Must NOT open a new transaction: Spark's beforeFetch has already
      // opened one (autoCommit=false) before sessionInitStatement runs, so
      // the statement has to upgrade the CURRENT transaction instead.
      assert(!stmt.toUpperCase.contains("BEGIN"),
        s"statement must not BEGIN a transaction: $stmt")
      assert(stmt.trim.toUpperCase.startsWith("SET TRANSACTION ISOLATION LEVEL"),
        s"isolation upgrade must precede the snapshot import: $stmt")
      assert(stmt.contains("SET TRANSACTION SNAPSHOT 'id''''with-quote'") ||
        stmt.contains("SET TRANSACTION SNAPSHOT 'id''with-quote'"),
        s"quote not escaped: $stmt")
    } finally snap.close()
  }
}
