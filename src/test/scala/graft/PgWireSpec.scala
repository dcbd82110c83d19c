package graft

import java.sql.Types

import org.scalatest.funsuite.AnyFunSuite

import graft.core.RetryPolicy
import graft.sources.pgwire.{PgWire, PgWireDriver}

/** Unit coverage for the pgwire shim's pure pieces — the parts that do not
  * need a live server (PgLiveSpec covers those). */
class PgWireSpec extends AnyFunSuite {

  test("SQLSTATE 40001 renders the psycopg2-style condition name the " +
    "reference classifier matches") {
    val ex = new PgWire.PgServerException("ERROR", "40001",
      "could not serialize access due to concurrent update")
    assert(ex.getMessage ==
      "(pgwire.SerializationFailure) ERROR: could not serialize access due to concurrent update")
    assert(ex.getSQLState == "40001")
    assert(RetryPolicy.isRetryable(ex))
    // Same through Spark's exception wrapping.
    assert(RetryPolicy.isRetryable(
      new RuntimeException("Exception thrown in awaitResult", ex)))
  }

  test("a recovery-conflict message classifies retryable from the raw " +
    "server text alone") {
    // On a hot standby the server message itself carries the phrase the
    // classifier matches (`floorist.py:31-63`); no condition-name mapping
    // is needed (57014 isn't in the mapped retryable set).
    val ex = new PgWire.PgServerException("ERROR", "57014",
      "canceling statement due to conflict with recovery")
    assert(ex.getMessage.contains("conflict with recovery"))
    assert(RetryPolicy.isRetryable(ex))
  }

  test("unknown SQLSTATEs render with the raw state and stay non-retryable") {
    val ex = new PgWire.PgServerException("ERROR", "22012", "division by zero")
    assert(ex.getMessage == "ERROR: division by zero [SQLSTATE 22012]")
    assert(!RetryPolicy.isRetryable(ex))
  }

  test("md5 password scheme matches the documented libpq construction") {
    // md5(md5("secret" + "alice") + salt) with salt "1234" — computed with
    // the formula from the PostgreSQL docs (protocol-flow / auth methods).
    val got = PgWire.md5Password("alice", "secret", "1234".getBytes("UTF-8"))
    val inner = PgWire.md5Hex("secretalice".getBytes("UTF-8"))
    val want = "md5" + PgWire.md5Hex(inner.getBytes("UTF-8") ++ "1234".getBytes("UTF-8"))
    assert(got == want)
    assert(got.startsWith("md5") && got.length == 35)
  }

  test("JDBC url parsing: host/port/db with and without explicit port") {
    assert(PgWireDriver.parseUrl("jdbc:postgresql://db.example:5433/prod") ==
      (("db.example", 5433, "prod")))
    assert(PgWireDriver.parseUrl("jdbc:postgresql://localhost/app?ssl=false") ==
      (("localhost", 5432, "app")))
    intercept[IllegalArgumentException] {
      PgWireDriver.parseUrl("jdbc:postgresql://hostonly")
    }
  }

  test("driver defers non-postgres urls per the JDBC contract") {
    val d = new PgWireDriver
    assert(!d.acceptsURL("jdbc:derby:memory:x"))
    assert(d.connect("jdbc:derby:memory:x", new java.util.Properties) == null)
    assert(d.acceptsURL("jdbc:postgresql://h/d"))
  }

  test("text decoding: timestamps with and without UTC offsets, dates, bytea") {
    import graft.sources.pgwire.PgText
    assert(PgText.parseTimestamp("2024-06-01 20:00:00+00").toInstant ==
      java.time.Instant.parse("2024-06-01T20:00:00Z"))
    assert(PgText.parseTimestamp("2024-06-01 20:30:00.123456+05:30").toInstant ==
      java.time.Instant.parse("2024-06-01T15:00:00.123456Z"))
    // No offset: interpreted in the JVM zone, same as java.sql.Timestamp.
    assert(PgText.parseTimestamp("2024-06-01 20:00:00.25") ==
      java.sql.Timestamp.valueOf("2024-06-01 20:00:00.25"))
    assert(PgText.parseDate("2024-02-29").toLocalDate ==
      java.time.LocalDate.of(2024, 2, 29))
    assert(PgText.parseBytea("\\x48656c6c6f").sameElements("Hello".getBytes("UTF-8")))
  }
}
